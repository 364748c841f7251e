"""Round-3 stage timings for the PRODUCTION fused 4K frame path.

Times the two production executables (compress_frame / decompress_frame)
and their internal phases as separately-jitted calls (dense two-region
interchange):

  compress   = pack relayout + fused DCT+quant+Huffman-encode kernel
               (regions A and C come straight out of the kernel)
  decompress = tree-parse kernel + fused payload-decode+IDCT kernel
               + unpack relayout (no window expansion at all)

Run stages selectively: python tools/exp_r3stage.py [full|sub|all]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.entropy import pallas_encode8 as pe8  # noqa: E402
from myyuv_tpu.entropy import pallas_decode8 as pd8  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402

I32 = jnp.int32


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    planes = bench.get_4k_planes()
    h, w = planes[0].shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc
    qts = [jnp.asarray(np.asarray(scalar.plane_qtable(i, 50), np.float32))
           for i in range(3)]
    y, u, v = [jnp.asarray(p) for p in planes]

    if which in ("full", "all"):
        comp = lambda: ds.compress_frame(y, u, v, *qts)  # noqa: E731
        cA, cC, sizes, total, ok = comp()
        print(f"compress_frame:   {timeit(lambda: comp()[0]):6.2f} ms "
              f"(ok={bool(ok)})")
        dec = lambda: ds.decompress_frame(  # noqa: E731
            cA, cC, sizes, *qts, h=h, w=w)
        print(f"decompress_frame: {timeit(lambda: dec()[0]):6.2f} ms")

    if which in ("sub", "all"):
        # --- compress sub-phases -----------------------------------------
        @jax.jit
        def packf(y, u, v):
            parts = [p8.pack_pixel_words(p) for p in (y, u, v)]
            xw = jnp.concatenate(parts, axis=1)
            padc = (-(n // 8)) % p8.TILE
            if padc:
                xw = jnp.concatenate(
                    [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
            return xw

        xw = packf(y, u, v)
        print(f"  pack:           {timeit(lambda: packf(y, u, v)):6.2f} ms")
        qtx = p8.expand_qtables(tuple(qts))
        pids = p8.plane_pids(ny, nc, xw.shape[1] - n // 8)
        fenc = jax.jit(lambda xw: pe8.dct_encode_words_packed(
            xw, qtx, pids, cont=8))
        C, A, sizes8, ok8 = fenc(xw)
        print(f"  dct+enc kernel: {timeit(lambda: fenc(xw)[1]):6.2f} ms")

        # --- decompress sub-phases ----------------------------------------
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        @jax.jit
        def jtree(W0, Wc):
            ntp = W0.shape[1]
            tile = pd8.TILE
            wcr = Wc.shape[0]
            return pl.pallas_call(
                pd8._tree_kernel8,
                out_shape=(jax.ShapeDtypeStruct((256, ntp), I32),
                           jax.ShapeDtypeStruct((72, ntp), I32),
                           jax.ShapeDtypeStruct((8, ntp), I32)),
                grid=(ntp // tile,),
                in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                          pl.BlockSpec((wcr, tile), lambda i: (0, i))],
                out_specs=(pl.BlockSpec((256, tile), lambda i: (0, i)),
                           pl.BlockSpec((72, tile), lambda i: (0, i)),
                           pl.BlockSpec((8, tile), lambda i: (0, i))),
                scratch_shapes=[pltpu.VMEM((512, tile), I32)],
            )(W0, Wc)

        sym2, counts, tbad = jtree(A, C)
        print(f"  tree kernel:    {timeit(lambda: jtree(A, C)[0]):6.2f} ms")

        # fused payload+idct (full decode path minus unpack)
        fdec = jax.jit(lambda W0, Wc: pd8.decode_idct_words8_split(
            W0, Wc, qtx, pids))
        pixw, okd = fdec(A, C)
        print(f"  tree+pay+idct:  {timeit(lambda: fdec(A, C)[0]):6.2f} ms")

        @jax.jit
        def junpack(pixw):
            nf8 = n // 8
            yv = p8.unpack_pixel_words(pixw[:, :ny // 8], h, w)
            uv = p8.unpack_pixel_words(
                pixw[:, ny // 8:(ny + nc) // 8], h // 2, w // 2)
            vv = p8.unpack_pixel_words(
                pixw[:, (ny + nc) // 8:nf8], h // 2, w // 2)
            return yv, uv, vv

        ry, ru, rv = junpack(pixw)
        print(f"  unpack:         {timeit(lambda: junpack(pixw)[0]):6.2f} ms")


if __name__ == "__main__":
    main()
