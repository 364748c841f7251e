"""Fused one-kernel decompress vs the two-kernel pipeline (real chip).

Validates decode_idct_words8_split_fused on the golden 4K q50 stream
(pixel-exact vs the two-kernel path) and device-times both variants.

Usage: python tools/exp_decfused.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from myyuv_tpu.engine import batch as eb
    from myyuv_tpu.engine import device_stream as ds
    from myyuv_tpu.entropy import pallas_decode8 as pd8
    from myyuv_tpu.kernels import pallas_dct8 as p8

    planes = bench.get_4k_planes()
    h, w = planes[0].shape
    qts = eb.plane_qtables([50] * 3)
    dev = tuple(jnp.asarray(p) for p in planes)
    cA, cC, sizes, total, ok = ds.compress_frame(*dev, *qts)
    bench._sync(cA)
    assert bool(np.asarray(ok).all() if np.asarray(ok).ndim else ok)

    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc
    qtx = p8.expand_qtables(qts)
    pids = p8.plane_pids(ny, nc, cA.shape[1] - n // 8)

    f2 = jax.jit(lambda: pd8.decode_idct_words8_split(cA, cC, qtx, pids))
    f1 = jax.jit(lambda: pd8.decode_idct_words8_split_fused(
        cA, cC, qtx, pids))
    w2, ok2 = f2()
    g1, ok1 = f1()
    same = (np.array_equal(np.asarray(w2), np.asarray(g1))
            and np.array_equal(np.asarray(ok2), np.asarray(ok1)))
    print("fused == two-kernel (pixw + ok):", same,
          "ok:", bool(np.asarray(ok1).all()), flush=True)

    t2 = bench._device_time(lambda: f2()[0], reps=20)
    t1 = bench._device_time(lambda: f1()[0], reps=20)
    print(f"two-kernel decode+IDCT: {t2*1e3:.3f} ms", flush=True)
    print(f"fused decode+IDCT:      {t1*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
