"""Sub-stage on-chip timings for the 4K frame codec internals."""
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
from myyuv_tpu.kernels import device as kdev  # noqa: E402


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=6):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=())
def fwd_all(y, u, v, qt_y, qt_u, qt_v):
    by = kdev.plane_to_blocks(y)
    bu = kdev.plane_to_blocks(u)
    bv = kdev.plane_to_blocks(v)
    ny, nc = by.shape[0], bu.shape[0]
    return jnp.concatenate([
        ds._fwd_transform(by.reshape(ny, 64), qt_y, "exact"),
        ds._fwd_transform(bu.reshape(nc, 64), qt_u, "exact"),
        ds._fwd_transform(bv.reshape(nc, 64), qt_v, "exact")])


@jax.jit
def enc(coeffs):
    words, sizes, ok = ds._encode_words_dispatch(coeffs)
    return words, sizes, ok


@functools.partial(jax.jit, static_argnames=("capr8_pb",))
def compact(words, sizes, capr8_pb=ds.CAPR8_DEFAULT):
    return ds._compact_words(words, sizes, jnp.bool_(True), capr8_pb)


@functools.partial(jax.jit, static_argnames=("cw",))
def expand8(content4, sizes, cw=16):
    sizes_r = ds._chunk_rows(sizes.astype(jnp.int32))
    return ds._expand_window8(content4, sizes_r, cw)


@functools.partial(jax.jit, static_argnames=("n",))
def dec8(Rp, n):
    return ds._decode_words8_dispatch(Rp, n)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def inv_all(coeffs, qt_y, qt_u, qt_v, h, w):
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    py = ds._inv_transform(coeffs[:ny], qt_y, "exact")
    pu = ds._inv_transform(coeffs[ny:ny + nc], qt_u, "exact")
    pv = ds._inv_transform(coeffs[ny + nc:], qt_v, "exact")
    y = kdev.blocks_to_plane(py.reshape(ny, 8, 8), h, w)
    u = kdev.blocks_to_plane(pu.reshape(nc, 8, 8), h // 2, w // 2)
    v = kdev.blocks_to_plane(pv.reshape(nc, 8, 8), h // 2, w // 2)
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

    t = timeit(lambda: fwd_all(y, u, v, *qts))
    print(f"fwd transform (3 planes): {t*1e3:7.1f} ms", flush=True)
    coeffs = fwd_all(y, u, v, *qts)

    t = timeit(lambda: enc(coeffs)[0])
    print(f"entropy encode:           {t*1e3:7.1f} ms", flush=True)
    words, sizes, ok = enc(coeffs)

    t = timeit(lambda: compact(words, sizes)[0])
    print(f"compaction:               {t*1e3:7.1f} ms", flush=True)
    content4, sizes2, total, ok2 = compact(words, sizes)

    t = timeit(lambda: expand8(content4, sizes2))
    print(f"expand window8:           {t*1e3:7.1f} ms", flush=True)
    Rp = expand8(content4, sizes2)

    t = timeit(lambda: dec8(Rp, n)[0])
    print(f"entropy decode8:          {t*1e3:7.1f} ms", flush=True)
    co2, dok = dec8(Rp, n)

    t = timeit(lambda: inv_all(co2, *qts, h=h, w=w)[0])
    print(f"inv transform (3 planes): {t*1e3:7.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
