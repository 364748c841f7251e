"""Sub-stage on-chip timings for the packed-8 encoder 4K frame path
(post packed-encoder: pack / dctq / encode8 / compact / expand / decode /
idct / unpack)."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.entropy import pallas_encode8 as pe8  # noqa: E402
from myyuv_tpu.entropy import pallas_decode8 as pd8  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402


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


@functools.partial(jax.jit, static_argnames=("ny", "nc", "h", "w"))
def idctw(outp, qt_y, qt_u, qt_v, ny, nc, h, w):
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    ntp = outp.shape[1]
    pids = p8.plane_pids(ny, nc, ntp - (ny + 2 * nc) // 8)
    return p8.dequantize_idct_words(outp, qtx, pids)


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", "/root/repo/bench.py")
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

    print(f"pack:   {timeit(lambda: pack_all(y, u, v)):6.2f} ms")
    xw = pack_all(y, u, v)
    print(f"dctq:   {timeit(lambda: dctq(xw, *qts, ny, nc)):6.2f} ms")
    cp = dctq(xw, *qts, ny, nc)
    enc = jax.jit(lambda c: pe8.encode_words_packed(c, cont=8))
    print(f"enc8:   {timeit(lambda: enc(cp)[2]):6.2f} ms")
    wordsC, A, sizes, ok = enc(cp)
    comp = jax.jit(lambda wc, a, s: ds._compact_split(
        wc, a, s, jnp.bool_(True), ds.CAPB8_DEFAULT))
    print(f"compact:{timeit(lambda: comp(wordsC, A, sizes[:n])[1]):6.2f} ms")
    cA, cB, s_, total, ok2 = comp(wordsC, A, sizes[:n])
    exp = jax.jit(lambda a, b, s: ds._expand_split(
        a, b, ds._chunk_rows(s), 16))
    print(f"expand: {timeit(lambda: exp(cA, cB, s_)[1]):6.2f} ms")
    W0, Wc = exp(cA, cB, s_)
    dec = jax.jit(lambda w0, wc: pd8.decode_words8_packed_split(w0, wc))
    print(f"decode: {timeit(lambda: dec(W0, Wc)[0]):6.2f} ms")
    outp, dok = dec(W0, Wc)
    print(f"idct:   {timeit(lambda: idctw(outp, *qts, ny, nc, h, w)):6.2f} ms")
    pixw = idctw(outp, *qts, ny, nc, h, w)
    unp = jax.jit(lambda pw: p8.unpack_pixel_words(
        pw[:, :ny // 8], h, w))
    print(f"unpackY:{timeit(lambda: unp(pixw)):6.2f} ms")


if __name__ == "__main__":
    main()
