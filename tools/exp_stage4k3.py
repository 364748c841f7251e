"""Sub-stage on-chip timings for the WORD-PACKED 4K frame codec path
(device_stream._compress_words_packed / _decode_idct_packed internals)."""
import functools
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
from myyuv_tpu.entropy import pallas_encode as pe  # noqa: E402
from myyuv_tpu.entropy import pallas_decode8 as pd8  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=8):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def pack_all(y, u, v):
    return jnp.concatenate([p8.pack_pixel_words(p) for p in (y, u, v)],
                           axis=1)


@functools.partial(jax.jit, static_argnames=("ny", "nc"))
def dctq(xw, qt_y, qt_u, qt_v, ny, nc):
    n = ny + 2 * nc
    padc = (-(n // 8)) % p8.TILE
    if padc:
        xw = jnp.concatenate([xw, jnp.zeros((128, padc), jnp.int32)],
                             axis=1)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = p8.plane_pids(ny, nc, padc)
    return p8.dct_quantize_words(xw, qtx, pids)


@functools.partial(jax.jit, static_argnames=("n",))
def pairsT_of(cp, n):
    ntp = cp.shape[1]
    return cp.reshape(32, 8, ntp).transpose(0, 2, 1).reshape(
        32, ntp * 8)[:, :n]


@jax.jit
def encp(pairsT):
    return pe.encode_words_pairs(pairsT, cont=8)


@functools.partial(jax.jit, static_argnames=("capb8_pb",))
def compact(words, aT, sizes, capb8_pb=ds.CAPB8_DEFAULT):
    return ds._compact_split(words, aT, sizes, jnp.bool_(True), capb8_pb)


@functools.partial(jax.jit, static_argnames=("cw",))
def expand8(cA, cB, sizes, cw=16):
    sizes_r = ds._chunk_rows(sizes.astype(jnp.int32))
    return ds._expand_split(cA, cB, sizes_r, cw)


@jax.jit
def dec8p(W0, Wc):
    return pd8.decode_words8_packed_split(W0, Wc)


@functools.partial(jax.jit, static_argnames=("ny", "nc"))
def idctw(outp, qt_y, qt_u, qt_v, ny, nc):
    n = ny + 2 * nc
    ntp = outp.shape[1]
    padc = (-ntp) % p8.TILE
    if padc:
        outp = jnp.concatenate(
            [outp, jnp.zeros((512, padc), jnp.int32)], axis=1)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = p8.plane_pids(ny, nc, ntp + padc - n // 8)
    return p8.dequantize_idct_words(outp, qtx, pids)


@functools.partial(jax.jit, static_argnames=("ny", "nc", "h", "w"))
def unpack_all(pixw, ny, nc, h, w):
    y = p8.unpack_pixel_words(pixw[:, :ny // 8], h, w)
    u = p8.unpack_pixel_words(
        pixw[:, ny // 8:(ny + nc) // 8], h // 2, w // 2)
    v = p8.unpack_pixel_words(
        pixw[:, (ny + nc) // 8:(ny + 2 * nc) // 8], h // 2, w // 2)
    return y, u, v


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc

    t = timeit(lambda: pack_all(y, u, v))
    print(f"pack pixel words:        {t*1e3:7.2f} ms", flush=True)
    xw = pack_all(y, u, v)

    t = timeit(lambda: dctq(xw, *qts, ny=ny, nc=nc))
    print(f"DCT+quant (pair out):    {t*1e3:7.2f} ms", flush=True)
    cp = dctq(xw, *qts, ny=ny, nc=nc)

    t = timeit(lambda: pairsT_of(cp, n))
    print(f"pairs relayout:          {t*1e3:7.2f} ms", flush=True)
    pairsT = pairsT_of(cp, n)

    t = timeit(lambda: encp(pairsT)[0])
    print(f"entropy encode (pairs):  {t*1e3:7.2f} ms", flush=True)
    words, aT, sizes, ok = encp(pairsT)

    t = timeit(lambda: compact(words, aT, sizes)[1])
    print(f"compaction (split B):    {t*1e3:7.2f} ms", flush=True)
    cA, cB, sizes2, total, ok2 = compact(words, aT, sizes)

    t = timeit(lambda: expand8(cA, cB, sizes2)[0])
    print(f"expand window (split):   {t*1e3:7.2f} ms", flush=True)
    W0, Wc = expand8(cA, cB, sizes2)

    t = timeit(lambda: dec8p(W0, Wc)[0])
    print(f"entropy decode8 packed:  {t*1e3:7.2f} ms", flush=True)
    outp, dok = dec8p(W0, Wc)

    t = timeit(lambda: idctw(outp, *qts, ny=ny, nc=nc))
    print(f"dequant+IDCT (word out): {t*1e3:7.2f} ms", flush=True)
    pixw = idctw(outp, *qts, ny=ny, nc=nc)

    t = timeit(lambda: unpack_all(pixw, ny, nc, h, w)[0])
    print(f"unpack pixel words:      {t*1e3:7.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
