"""Packed-layout DCT pipeline timings vs the flat path (real chip).

Measures the XLA relayouts + packed kernels that would replace the
current flat [N, 64] transform stages (fwd_all 16.5 ms / inv_all
15.8 ms on the 4K golden frame, tools/exp_stage4k2.py):

  pack:     planes -> [512, ntp] i32 packed element-major
  fwd8:     dct_quantize_packed (message-order output)
  unpackT:  packed coeffs -> [64, N] i32 (flat encoder's input layout)
  inv8:     dequantize_idct_packed (consumes decoder output directly)
  unplane:  packed pixels -> 3 planes
"""
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
from myyuv_tpu.kernels import device as kdev  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402

TILE = p8.TILE


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


@jax.jit
def pack_all(y, u, v):
    parts = []
    for p in (y, u, v):
        b = kdev.plane_to_blocks(p)
        n = b.shape[0]
        parts.append(p8.pack_rows8(b.reshape(n, 64).astype(jnp.int32)))
    xp = jnp.concatenate(parts, axis=1)
    pad = (-xp.shape[1]) % TILE
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((512, pad), jnp.int32)], axis=1)
    return xp


@jax.jit
def fwd8(xp, qtx, pids):
    return p8.dct_quantize_packed(xp, qtx, pids)


@functools.partial(jax.jit, static_argnames=("n",))
def unpackT(cp, n):
    ntp = cp.shape[1]
    return cp.reshape(64, 8, ntp).transpose(0, 2, 1).reshape(
        64, ntp * 8)[:, :n]


@jax.jit
def inv8(cp, qtx, pids):
    return p8.dequantize_idct_packed(cp, qtx, pids)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def unplane(pp, h, w):
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    segs = [(0, ny, h, w), (ny, nc, h // 2, w // 2),
            (ny + nc, nc, h // 2, w // 2)]
    planes = []
    for off, n, ph, pw in segs:
        seg = pp[:, off // 8:(off + n) // 8]
        rows = p8.unpack_rows8(seg).astype(jnp.uint8)
        planes.append(kdev.blocks_to_plane(rows.reshape(n, 8, 8), ph, pw))
    return tuple(planes)


def main():
    import bench
    planes = bench.get_4k_planes()
    h, w = planes[0].shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc
    pad_cols = (-(n // 8)) % TILE
    y, u, v = [jnp.asarray(p) for p in planes]
    qts = eb.plane_qtables([50] * 3)
    qtx = p8.expand_qtables(qts)
    pids = p8.plane_pids(ny, nc, pad_cols)

    t = timeit(lambda: pack_all(y, u, v))
    print(f"pack planes->[512,ntp]:   {t*1e3:7.1f} ms", flush=True)
    xp = pack_all(y, u, v)

    t = timeit(lambda: fwd8(xp, qtx, pids))
    print(f"fwd8 dct+quant packed:    {t*1e3:7.1f} ms", flush=True)
    cp = fwd8(xp, qtx, pids)

    t = timeit(lambda: unpackT(cp, n))
    print(f"unpackT coeffs->[64,N]:   {t*1e3:7.1f} ms", flush=True)

    t = timeit(lambda: inv8(cp, qtx, pids))
    print(f"inv8 deq+idct packed:     {t*1e3:7.1f} ms", flush=True)
    pp = inv8(cp, qtx, pids)

    t = timeit(lambda: unplane(pp, h, w)[0])
    print(f"unplane packed->planes:   {t*1e3:7.1f} ms", flush=True)

    # correctness vs the flat path on the same data
    ry, ru, rv = unplane(pp, h, w)
    from myyuv_tpu.engine import device_stream as ds
    want = np.asarray(ds._inv_transform(
        ds._fwd_transform(kdev.plane_to_blocks(y).reshape(ny, 64),
                          qts[0], "exact"), qts[0], "exact"))
    got = np.asarray(ry)
    wplane = np.asarray(kdev.blocks_to_plane(
        jnp.asarray(want).reshape(ny, 8, 8), h, w))
    print("luma match:", bool((got == wplane).all()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
