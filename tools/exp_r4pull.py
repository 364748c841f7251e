"""Round-4 experiment: d2h pull latency/bandwidth + overlap (VERDICT #2).

The streaming driver must pull compressed bytes down per frame; this
tool measures what the tunnel actually does:
  - d2h pull time vs size (latency floor + effective bandwidth)
  - copy_to_host_async overlap with an async chain of roundtrips
  - h2d upload chain cost per 4K frame (18.2 MB of planes)
  - compress_only chain rerun in isolation (anomaly check from
    exp_r4stream: 28 ms/exec vs the 4.4 ms device time)

Usage: python tools/exp_r4pull.py
"""

import sys
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


def log(*a):
    print(*a, flush=True)


def _sync(x):
    np.asarray(x.ravel()[:1] if getattr(x, "ndim", 0) else x)


def main():
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

    r = rt()
    _sync(r)
    cA, cC, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
    _sync(cA)

    # --- d2h pull time vs size -------------------------------------------
    for nbytes in (4096, 1 << 20, 4 << 20, 9 << 20):
        n = nbytes // 4
        xs = [jnp.zeros((n,), jnp.int32) + i for i in range(3)]
        for x in xs:
            _sync(x)
        t0 = time.perf_counter()
        for x in xs:
            np.asarray(x)
        dt = (time.perf_counter() - t0) / 3
        log(f"d2h {nbytes/1e6:6.2f} MB: {dt*1e3:8.1f} ms "
            f"({nbytes/dt/1e6:7.1f} MB/s)")

    # --- u8 vs i32 pull of the same logical bytes --------------------------
    xu8 = jnp.zeros((4 << 20,), jnp.uint8) + jnp.uint8(1)
    _sync(xu8)
    t0 = time.perf_counter()
    np.asarray(xu8)
    log(f"d2h 4 MB u8: {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # --- copy_to_host_async overlap ----------------------------------------
    # serial: N roundtrips then pull 4 MB
    big = jnp.zeros((1 << 20,), jnp.int32) + 7
    _sync(big)
    N = 20
    t0 = time.perf_counter()
    outs = None
    for _ in range(N):
        outs = rt()
    _sync(outs)
    np.asarray(big)
    serial = time.perf_counter() - t0
    log(f"serial  {N} rt + 4MB pull: {serial*1e3:8.1f} ms")
    # overlapped: start async copy first
    t0 = time.perf_counter()
    big.copy_to_host_async()
    for _ in range(N):
        outs = rt()
    _sync(outs)
    np.asarray(big)
    overl = time.perf_counter() - t0
    log(f"overlap {N} rt + 4MB pull: {overl*1e3:8.1f} ms")

    # --- does a pull of frame i-1's result stall the chain? ----------------
    t0 = time.perf_counter()
    prev = None
    for i in range(N):
        cur = ds.compress_frame(y, u, v, *qts)
        if prev is not None:
            np.asarray(prev[2])            # pull frame i-1's sizes (1.1 MB)
        prev = cur
    np.asarray(prev[2])
    dt = (time.perf_counter() - t0) / N
    log(f"compress chain + per-frame sizes pull: {dt*1e3:8.2f} ms/frame")

    # --- h2d upload chain ---------------------------------------------------
    t0 = time.perf_counter()
    for i in range(8):
        yy = jnp.asarray(planes_np[0])
        uu = jnp.asarray(planes_np[1])
        vv = jnp.asarray(planes_np[2])
    _sync(yy)
    dt = (time.perf_counter() - t0) / 8
    log(f"h2d 18.2 MB planes: {dt*1e3:8.1f} ms/frame "
        f"({18.2/dt:6.1f} MB/s)")

    # --- compress_only rerun (isolated) -------------------------------------
    N = 20
    t0 = time.perf_counter()
    outs = None
    for _ in range(N):
        outs = ds.compress_frame(y, u, v, *qts)
    _sync(outs[0])
    dt = (time.perf_counter() - t0) / N
    log(f"compress_only chain (isolated): {dt*1e3:8.2f} ms/exec")

    # --- roundtrip chain again (order control) ------------------------------
    t0 = time.perf_counter()
    for _ in range(N):
        outs2 = rt()
    _sync(outs2)
    dt = (time.perf_counter() - t0) / N
    log(f"roundtrip chain (after):        {dt*1e3:8.2f} ms/frame")


if __name__ == "__main__":
    main()
