"""Capture a jax.profiler trace of the frame codec executables."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
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
    ry, *_ = ds.decompress_frame(c4, sizes, *qts, h=h, w=w)
    sync(ry)

    with jax.profiler.trace("/root/repo/.profiles/frame"):
        for _ in range(3):
            c4, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
            ry, *_ = ds.decompress_frame(c4, sizes, *qts, h=h, w=w)
        sync(ry)
    print("trace captured", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
