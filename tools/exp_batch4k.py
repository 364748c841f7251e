"""Experiment: batched 4K on-chip roundtrips — how much of the 71.7 ms
single-frame roundtrip is per-dispatch overhead?

Run on the real chip. B copies of the golden 4K frame (jittered so the
streams differ), timed per frame.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402


def sync(x):
    np.asarray(x.ravel()[:1])


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rng = np.random.default_rng(3)
    mk = lambda p: jnp.asarray(np.stack(  # noqa: E731
        [np.clip(p.astype(np.int16) + rng.integers(-2, 3, p.shape),
                 0, 255).astype(np.uint8) for _ in range(B)]))
    y, u, v = mk(planes[0]), mk(planes[1]), mk(planes[2])

    t0 = time.perf_counter()
    (ry, _, _), total, ok = ds.roundtrip_batch(y, u, v, qts)
    sync(ry)
    print(f"B={B} compile+run: {time.perf_counter()-t0:.1f}s ok={bool(ok)}",
          flush=True)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        (ry, _, _), total, ok = ds.roundtrip_batch(y, u, v, qts)
    sync(ry)
    dt = (time.perf_counter() - t0) / (reps * B)
    print(f"batched 4K roundtrip: {dt*1e3:.1f} ms/frame "
          f"({1/dt:.2f} frames/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
