"""Measure compress_frame vs decompress_frame split (cached executables)."""
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
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]

    c4, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
    sync(c4)
    t0 = time.perf_counter()
    for _ in range(10):
        c4, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
    sync(c4)
    dt_c = (time.perf_counter() - t0) / 10
    print(f"compress_frame: {dt_c*1e3:.1f} ms", flush=True)

    ry, ru, rv, dok = ds.decompress_frame(c4, sizes, *qts, h=h, w=w)
    sync(ry)
    t0 = time.perf_counter()
    for _ in range(10):
        ry, ru, rv, dok = ds.decompress_frame(c4, sizes, *qts, h=h, w=w)
    sync(ry)
    dt_d = (time.perf_counter() - t0) / 10
    print(f"decompress_frame: {dt_d*1e3:.1f} ms", flush=True)
    print(f"sum: {(dt_c+dt_d)*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
