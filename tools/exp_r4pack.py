"""Round-4: pack/unpack relayouts via MXU permutation matmuls.

The [H, W] plane <-> [128, N/8] packed-word relayouts are XLA
transposes whose HBM access degenerates to 8-byte runs (~14 GB/s
effective; pack 1.28 ms + unpack 1.39 ms device time per 4K frame,
57-63x their byte bound — VERDICT r3 #1). In-kernel fusion is blocked:
Mosaic rejects every lane-stride primitive (tools/exp_r4lane.py).

This variant rides the MXU instead: the lane permutation within a
block row is a 0/1 matrix P, applied to the plane's BYTE planes in
bf16 (bytes 0..255 are exact in bf16; each P column selects exactly
one input word, so the f32 accumulation is a single exact byte). The
only remaining data movement is a major-dims transpose whose minor runs
are L*4 bytes (252 B for 4K luma) — DMA-friendly.

  pack:    v = bitcast(plane)           [H, 2wb] i32
           B_j = (v >> 8j) & 255        -> bf16
           O_j = B_j @ P                [H, 2wb]    (4 matmuls)
           O   = sum O_j << 8j          i32
           xw  = O.reshape(H/8,8,16,L).transpose(1,2,0,3).reshape(128,n8)
  unpack:  the exact inverse (transpose first, then @ P^T per byte).

wb % 8 == 0 -> 1-row units (4K luma, 1080p both planes);
wb % 4 == 0 -> 2-row units, two half-matmuls (4K chroma).

Usage: python tools/exp_r4pack.py
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BF16 = jnp.bfloat16
F32 = jnp.float32
I32 = jnp.int32


def sync(x):
    np.asarray(x.ravel()[:1])


_SYNC = [0.0]


def timeit(fn, reps=30):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return ((time.perf_counter() - t0) - _SYNC[0]) / reps * 1e3


def _perm(L):
    """[16L, 16L] bf16; P[w, m] = 1 iff w = 16*(m%L) + 2*((m//L)%8) + m//(8L)."""
    n = 16 * L
    w = jax.lax.broadcasted_iota(I32, (n, n), 0)
    m = jax.lax.broadcasted_iota(I32, (n, n), 1)
    src = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    return (w == src).astype(BF16)


def pack_mxu(plane):
    h, w = plane.shape
    wb = w // 8
    L = wb // 8
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), I32)           # [H, 2wb]
    P = _perm(L)
    o = jnp.zeros((h, 2 * wb), I32)
    for j in range(4):
        bj = ((v >> (8 * j)) & 255).astype(BF16)
        oj = jnp.dot(bj, P, precision=HI,
                     preferred_element_type=F32).astype(I32)
        o = o | (oj << (8 * j))
    n8 = (h // 8) * L
    return o.reshape(h // 8, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, n8)


def unpack_mxu(xw, ph, pw):
    wb = pw // 8
    L = wb // 8
    n8 = xw.shape[1]
    o = xw.reshape(8, 16, ph // 8, L).transpose(2, 0, 1, 3).reshape(
        ph, 2 * wb)
    P = _perm(L)
    v = jnp.zeros((ph, 2 * wb), I32)
    for j in range(4):
        bj = ((o >> (8 * j)) & 255).astype(BF16)
        vj = jnp.dot(bj, P.T, precision=HI,
                     preferred_element_type=F32).astype(I32)
        v = v | (vj << (8 * j))
    return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(ph, pw)


def _perm2(L, wb):
    """2-row-unit matrices (wb % 4 == 0, wb % 8 != 0): (P_lo, P_hi)
    [2wb, 16L] bf16 — row-0 and row-1 halves of a 2-block-row unit."""
    n = 16 * L                    # = 2 * 2wb? no: 16L = 2wb*? (L = wb/4? )
    w = jax.lax.broadcasted_iota(I32, (2 * wb, n), 0)
    m = jax.lax.broadcasted_iota(I32, (2 * wb, n), 1)
    c = m % L
    r = (m // L) % 8
    k1 = m // (8 * L)
    bb = 8 * c + r                # block index within the 2-row unit
    lo = bb < wb
    src = 2 * jnp.where(lo, bb, bb - wb) + k1
    return ((w == src) & lo).astype(BF16), ((w == src) & ~lo).astype(BF16)


def pack_mxu2(plane):
    """2-row-unit variant for wb % 4 == 0 (4K chroma: wb = 252)."""
    h, w = plane.shape
    wb = w // 8
    L = wb // 4                   # lanes per 2-block-row unit
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), I32)           # [H, 2wb]
    vu = v.reshape(h // 16, 2, 8, 2 * wb)
    A = vu[:, 0].reshape(h // 2, 2 * wb)
    B = vu[:, 1].reshape(h // 2, 2 * wb)
    Plo, Phi = _perm2(L, wb)
    o = jnp.zeros((h // 2, 16 * L), I32)
    for j in range(4):
        aj = ((A >> (8 * j)) & 255).astype(BF16)
        bj = ((B >> (8 * j)) & 255).astype(BF16)
        oj = (jnp.dot(aj, Plo, precision=HI, preferred_element_type=F32)
              + jnp.dot(bj, Phi, precision=HI,
                        preferred_element_type=F32)).astype(I32)
        o = o | (oj << (8 * j))
    n8 = (h // 16) * L
    return o.reshape(h // 16, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, n8)


def unpack_mxu2(xw, ph, pw):
    wb = pw // 8
    L = wb // 4
    o = xw.reshape(8, 16, ph // 16, L).transpose(2, 0, 1, 3).reshape(
        ph // 2, 16 * L)
    Plo, Phi = _perm2(L, wb)
    A = jnp.zeros((ph // 2, 2 * wb), I32)
    B = jnp.zeros((ph // 2, 2 * wb), I32)
    for j in range(4):
        oj = ((o >> (8 * j)) & 255).astype(BF16)
        aj = jnp.dot(oj, Plo.T, precision=HI,
                     preferred_element_type=F32).astype(I32)
        bj = jnp.dot(oj, Phi.T, precision=HI,
                     preferred_element_type=F32).astype(I32)
        A = A | (aj << (8 * j))
        B = B | (bj << (8 * j))
    v = jnp.stack([A.reshape(ph // 16, 8, 2 * wb),
                   B.reshape(ph // 16, 8, 2 * wb)], axis=1)
    v = v.reshape(ph, 2 * wb)
    return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(ph, pw)


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.zeros((8, 128), I32) + 1
    sync(x)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    _SYNC[0] = (time.perf_counter() - t0) / 5
    print(f"sync: {_SYNC[0]*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    luma = jnp.asarray(rng.integers(0, 256, (3008, 4032), np.uint8))
    chroma = jnp.asarray(rng.integers(0, 256, (1504, 2016), np.uint8))

    jp_old = jax.jit(p8.pack_pixel_words)
    ju_old = jax.jit(p8.unpack_pixel_words, static_argnums=(1, 2))
    jp_new = jax.jit(pack_mxu)
    ju_new = jax.jit(unpack_mxu, static_argnums=(1, 2))
    jp2 = jax.jit(pack_mxu2)
    ju2 = jax.jit(unpack_mxu2, static_argnums=(1, 2))

    want = np.asarray(jp_old(luma))
    got = np.asarray(jp_new(luma))
    print("luma pack exact:", np.array_equal(want, got), flush=True)
    back = np.asarray(ju_new(jp_new(luma), 3008, 4032))
    print("luma unpack exact:", np.array_equal(back, np.asarray(luma)),
          flush=True)
    wantc = np.asarray(jp_old(chroma))
    gotc = np.asarray(jp2(chroma))
    print("chroma pack exact:", np.array_equal(wantc, gotc), flush=True)
    backc = np.asarray(ju2(jp2(chroma), 1504, 2016))
    print("chroma unpack exact:", np.array_equal(backc, np.asarray(chroma)),
          flush=True)

    print(f"pack  old luma : {timeit(lambda: jp_old(luma)):7.3f} ms",
          flush=True)
    print(f"pack  mxu luma : {timeit(lambda: jp_new(luma)):7.3f} ms",
          flush=True)
    print(f"unpk  old luma : "
          f"{timeit(lambda: ju_old(jp_old(luma), 3008, 4032)):7.3f} ms "
          f"(incl pack)", flush=True)
    xwl = jp_new(luma)
    sync(xwl)
    print(f"unpk  mxu luma : {timeit(lambda: ju_new(xwl, 3008, 4032)):7.3f}"
          f" ms", flush=True)
    print(f"pack  old chr  : {timeit(lambda: jp_old(chroma)):7.3f} ms",
          flush=True)
    print(f"pack  mxu2 chr : {timeit(lambda: jp2(chroma)):7.3f} ms",
          flush=True)
    xwc = jp2(chroma)
    sync(xwc)
    print(f"unpk  mxu2 chr : {timeit(lambda: ju2(xwc, 1504, 2016)):7.3f}"
          f" ms", flush=True)


if __name__ == "__main__":
    main()
