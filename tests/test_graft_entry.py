"""Driver entry points must keep compiling and running."""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    (ry, ru, rv), metrics = jax.jit(fn)(*args)
    assert ry.shape == args[0].shape
    assert int(np.asarray(metrics["symbol_hist"]).sum()) == (
        args[0].size + args[1].size + args[2].size)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    graft.dryrun_multichip(8)
