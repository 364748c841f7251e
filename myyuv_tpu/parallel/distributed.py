"""Multi-host orchestration: initialization, sharded batches, ragged gather.

The reference is single-process (SURVEY.md §2.3); this module is the
framework's scale-out story:

* ``initialize`` wraps ``jax.distributed.initialize`` (no-op when
  single-process, e.g. tests and the single-chip dev box).
* ``shard_batch``/``gather_streams`` implement the multi-host ragged
  gather of SURVEY.md §8 item 5: every host compresses its local frames,
  chunk-size tables are all-gathered, and offsets are assigned by a global
  exclusive prefix sum (the cross-host generalization of
  DCTYUVPlane::getContentPos, DCT.cpp:21-33) so any host can assemble a
  valid single-file ``.myyuv`` payload.
* global RD statistics (symbol histograms, SSE) ride the replicated-output
  shardings of engine.batch.make_sharded_roundtrip — XLA lowers them to
  psum over ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-process JAX init; safe no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def local_shard(n_items: int) -> Tuple[int, int]:
    """[start, stop) of this host's share of a global batch."""
    pid, pcount = process_info()
    per = (n_items + pcount - 1) // pcount
    return min(pid * per, n_items), min((pid + 1) * per, n_items)


def allgather_sizes(local_sizes: np.ndarray) -> List[np.ndarray]:
    """All hosts' chunk-size tables (host-side collective).

    Single-process: identity. Multi-process: uses
    jax.experimental.multihost_utils.process_allgather.
    """
    if jax.process_count() == 1:
        return [np.asarray(local_sizes)]
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray(local_sizes), tiled=False)
    return [np.asarray(g) for g in gathered]


def global_offsets(all_sizes: Sequence[np.ndarray]) -> np.ndarray:
    """Per-host byte offset of each host's content in the merged stream."""
    totals = np.array([int(s.astype(np.int64).sum()) for s in all_sizes],
                      np.int64)
    return np.concatenate([[0], np.cumsum(totals)[:-1]])
