"""Round-4 experiment: sustained multi-frame 4K throughput (VERDICT #2).

The r3 stage table shows 7.07 ms of device time per roundtrip but
10.25 ms of wall — ~3.2 ms is the tunnel's per-execute latency. This
tool measures whether that latency can be HIDDEN by keeping K frames in
flight (issue compress/decompress for frame N+1 before syncing frame N)
or by dispatching from multiple host threads.

Variants (each over the same golden 4K frame, REPS frames):
  seq_sync      sync after every roundtrip (latency fully exposed)
  async_chain   dispatch all roundtrips, one sync at the end (what
                bench.py's _time does today)
  window_K      rolling window: sync frame i-K when issuing frame i
  threads_T     T python threads each running independent roundtrips
  compress_only async chain of compress executes only (per-execute floor)

Usage: python tools/exp_r4stream.py [reps]
"""

import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def log(*a):
    print(*a, flush=True)


def _sync(x):
    np.asarray(x.ravel()[:1] if getattr(x, "ndim", 0) else x)


def main():
    sys.path.insert(0, str(REPO))
    import bench

    log("devices:", jax.devices())
    planes_np = bench.get_4k_planes()
    h, w = planes_np[0].shape
    qts = eb.plane_qtables([50] * 3)
    y, u, v = [jnp.asarray(p) for p in planes_np]

    def rt():
        cA, cC, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
        ry, ru, rv, dok = ds.decompress_frame(cA, cC, sizes, *qts,
                                              h=h, w=w)
        return ry

    # warm both executables
    r = rt()
    _sync(r)

    # --- seq_sync ---------------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(REPS):
        _sync(rt())
    dt = (time.perf_counter() - t0) / REPS
    log(f"seq_sync:      {dt*1e3:7.2f} ms/frame  ({1/dt:6.1f} fps)")

    # --- async_chain ------------------------------------------------------
    t0 = time.perf_counter()
    outs = None
    for _ in range(REPS):
        outs = rt()
    _sync(outs)
    dt = (time.perf_counter() - t0) / REPS
    log(f"async_chain:   {dt*1e3:7.2f} ms/frame  ({1/dt:6.1f} fps)")

    # --- window_K ---------------------------------------------------------
    for K in (2, 4, 8):
        ring = [None] * K
        t0 = time.perf_counter()
        for i in range(REPS):
            if ring[i % K] is not None:
                _sync(ring[i % K])
            ring[i % K] = rt()
        for r in ring:
            if r is not None:
                _sync(r)
        dt = (time.perf_counter() - t0) / REPS
        log(f"window_{K}:      {dt*1e3:7.2f} ms/frame  ({1/dt:6.1f} fps)")

    # --- threads_T --------------------------------------------------------
    for T in (2, 4):
        per = REPS // T

        def worker(out, idx):
            last = None
            for _ in range(per):
                last = rt()
            _sync(last)
            out[idx] = True

        done = [False] * T
        ths = [threading.Thread(target=worker, args=(done, i))
               for i in range(T)]
        t0 = time.perf_counter()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        dt = (time.perf_counter() - t0) / (per * T)
        log(f"threads_{T}:     {dt*1e3:7.2f} ms/frame  ({1/dt:6.1f} fps)")

    # --- compress_only ----------------------------------------------------
    t0 = time.perf_counter()
    outs = None
    for _ in range(REPS):
        outs = ds.compress_frame(y, u, v, *qts)
    _sync(outs[0])
    dt = (time.perf_counter() - t0) / REPS
    log(f"compress_only: {dt*1e3:7.2f} ms/exec   ({1/dt:6.1f} exec/s)")

    # --- dispatch cost (host side, no sync at all) -------------------------
    t0 = time.perf_counter()
    for _ in range(8):
        outs = ds.compress_frame(y, u, v, *qts)
    dt = (time.perf_counter() - t0) / 8
    log(f"dispatch_only: {dt*1e3:7.2f} ms/call (host-side enqueue cost)")
    _sync(outs[0])


if __name__ == "__main__":
    main()
