"""Multi-host orchestration helpers (single-process degenerate paths).

Real multi-host runs need a pod; these validate the sharding arithmetic and
the ragged-gather offset assignment (the cross-host getContentPos analog,
SURVEY.md §8 item 5) that any host count reduces to.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from myyuv_tpu.parallel import distributed  # noqa: E402


def test_initialize_single_process_noop():
    distributed.initialize()  # must not raise
    pid, pcount = distributed.process_info()
    assert pid == 0 and pcount == 1


def test_local_shard_covers_batch():
    lo, hi = distributed.local_shard(10)
    assert (lo, hi) == (0, 10)


def test_allgather_sizes_identity():
    sizes = np.array([3, 255, 17], np.uint8)
    out = distributed.allgather_sizes(sizes)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], sizes)


def test_global_offsets():
    all_sizes = [np.array([10, 20], np.uint8), np.array([5], np.uint8),
                 np.array([255, 255], np.uint8)]
    offs = distributed.global_offsets(all_sizes)
    np.testing.assert_array_equal(offs, [0, 30, 35])
