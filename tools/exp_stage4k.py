"""Per-stage on-chip timings for the 4K frame codec (run on real TPU)."""
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


def timeit(fn, reps=6):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]

    t0 = time.perf_counter()
    c4, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
    sync(c4)
    print(f"compress compile+run {time.perf_counter()-t0:.1f}s "
          f"ok={bool(ok)} total={int(total)}", flush=True)
    t0 = time.perf_counter()
    ry, ru, rv, dok = ds.decompress_frame(c4, sizes, *qts, h=h, w=w)
    sync(ry)
    print(f"decompress compile+run {time.perf_counter()-t0:.1f}s "
          f"ok={bool(dok)}", flush=True)

    tc = timeit(lambda: ds.compress_frame(y, u, v, *qts)[0])
    print(f"compress_frame:   {tc*1e3:7.1f} ms", flush=True)
    td = timeit(lambda: ds.decompress_frame(c4, sizes, *qts, h=h, w=w)[0])
    print(f"decompress_frame: {td*1e3:7.1f} ms", flush=True)
    print(f"roundtrip:        {(tc+td)*1e3:7.1f} ms "
          f"({1/(tc+td):.2f} fps)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
