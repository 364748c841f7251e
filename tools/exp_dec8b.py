"""Per-kernel breakdown of the packed8 decoder on the 4K golden luma."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from myyuv_tpu import YUVImage  # noqa: E402
from myyuv_tpu.entropy import pallas_decode, pallas_decode8 as d8  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402

I32 = jnp.int32


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(f, *a, label="", reps=5):
    r = f(*a)
    sync(r[0] if isinstance(r, tuple) else r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    sync(r[0] if isinstance(r, tuple) else r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return r


def main():
    print("devices:", jax.devices(), flush=True)
    big = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    p = DCTStream.parse(big.data).planes[0]
    lanes = p.to_lanes()
    n = lanes.shape[0]
    tile = d8.TILE
    lj = jnp.asarray(lanes)
    words, _ = pallas_decode._pack_words(lj)
    w16 = words[:16]
    npad = (-n) % (8 * tile)
    fill = jnp.zeros((16, npad), I32).at[0, :].set(pallas_decode._FILLER_W0)
    w16 = jnp.concatenate([w16, fill], axis=1)
    wp = jax.jit(d8.pack8_rows)(w16)
    ntp = wp.shape[1]
    print(f"{n} blocks, ntp={ntp}, tile={tile}", flush=True)

    @jax.jit
    def meta_of(wp):
        w0 = wp[0:8]
        b0 = pallas_decode._bitrev8(pallas_decode._shr_l(w0, 24) & 0xFF)
        b1 = pallas_decode._bitrev8(pallas_decode._shr_l(w0, 16) & 0xFF)
        b2 = pallas_decode._bitrev8(pallas_decode._shr_l(w0, 8) & 0xFF)
        return jnp.concatenate([b0 | (b1 << 8), b2], axis=0)

    meta = timeit(meta_of, wp, label="meta")
    grid = (ntp // tile,)

    @jax.jit
    def tree(wp, meta):
        return pl.pallas_call(
            d8._tree_kernel8,
            out_shape=(jax.ShapeDtypeStruct((256, ntp), I32),
                       jax.ShapeDtypeStruct((72, ntp), I32),
                       jax.ShapeDtypeStruct((8, ntp), I32)),
            grid=grid,
            in_specs=[pl.BlockSpec((128, tile), lambda i: (0, i)),
                      pl.BlockSpec((16, tile), lambda i: (0, i))],
            out_specs=(pl.BlockSpec((256, tile), lambda i: (0, i)),
                       pl.BlockSpec((72, tile), lambda i: (0, i)),
                       pl.BlockSpec((8, tile), lambda i: (0, i))),
            scratch_shapes=[pltpu.VMEM((512, tile), I32)],
        )(wp, meta)

    sym2, counts, tbad = timeit(tree, wp, meta, label="tree kernel")

    @jax.jit
    def payload(wp, meta, sym2, counts, tbad):
        return pl.pallas_call(
            d8._payload_kernel8,
            out_shape=(jax.ShapeDtypeStruct((528, ntp), I32),
                       jax.ShapeDtypeStruct((8, ntp), I32)),
            grid=grid,
            in_specs=[pl.BlockSpec((128, tile), lambda i: (0, i)),
                      pl.BlockSpec((16, tile), lambda i: (0, i)),
                      pl.BlockSpec((256, tile), lambda i: (0, i)),
                      pl.BlockSpec((72, tile), lambda i: (0, i)),
                      pl.BlockSpec((8, tile), lambda i: (0, i))],
            out_specs=(pl.BlockSpec((528, tile), lambda i: (0, i)),
                       pl.BlockSpec((8, tile), lambda i: (0, i))),
        )(wp, meta, sym2, counts, tbad)

    out, ok = timeit(payload, wp, meta, sym2, counts, tbad,
                     label="payload kernel")

    @jax.jit
    def unpack(out, ok):
        m = out[:512].reshape(64, 8, ntp).transpose(2, 1, 0)
        m = m.reshape(ntp * 8, 64)
        return m[:, d8._IZZ].astype(jnp.int16), ok.T.reshape(ntp * 8)

    timeit(unpack, out, ok, label="unpack+gather")
    return 0


if __name__ == "__main__":
    sys.exit(main())
