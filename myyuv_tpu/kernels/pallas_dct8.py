"""Sublane-packed Pallas DCT kernels: element-major [512, TP] layout.

Successor of kernels/pallas_dct.py for the frame codec hot path. The flat
[TILE, 64] kernels slice blocks column-wise, so every operand is a
[TILE, 8] slab using 8 of 128 lanes; here blocks ride lanes 8-per-column
(block b = c*8 + r at sublane r, lane c — the entropy kernels' packed
layout) and every DCT term is a dense [8, TP] slice:

  stage 1 (M . B):   out elem (8i+j) = sum_k lit(M[i,k]) * elem(8k+j)
  stage 2 (T . M'):  out elem (8i+j) = sum_k lit(M'[k,j]) * elem(8i+k)

Both stages are scalar-literal x [8, TP] multiply-adds — full vector
utilization with zero shuffles. The zigzag permutation is FREE: it folds
into which slice each stage reads/writes (static indices), so the forward
kernel emits coefficient rows already in message order for the entropy
encoder, and the inverse kernel consumes the entropy decoder's packed
output directly.

Bit-exactness: identical scalar accumulation order and FMA-defeat
(runtime zero after every multiply) as kernels/device._seq_matmul, and
the same division-free _exact_quantize / round_half_away — the packed
layout only changes vector shapes, not the per-element op sequence
(reference semantics: DCT.cpp:269-335).

Per-plane quantization tables ride as a [3*512, 1] input (value per
element row, lane-broadcast — a [3, 8, 8] -> row-expanded layout built
host-side) plus PER-COLUMN plane ids ([1, NTP] i32), so one kernel sweeps
a whole frame's Y/U/V blocks without tile-aligning the plane boundaries
(a 4K frame's luma segment is 23,688 lane columns — not a tile multiple).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import device as kdev
from .constants import DCT_MATRIX8
from ..entropy.reference import ZIGZAG

F32 = jnp.float32
I32 = jnp.int32
TILE = 512          # lane columns per grid program (8 blocks each)

_C_NP = DCT_MATRIX8
_ZZ = np.asarray(ZIGZAG, np.int64)
_IZZ = np.argsort(_ZZ)


def _qt_select(qt_ref, pid_ref):
    """[3*512, 1] row-expanded tables + [1, TP] col plane ids -> [512, TP]."""
    pid = pid_ref[...]
    q0 = qt_ref[0:512, :]
    q1 = qt_ref[512:1024, :]
    q2 = qt_ref[1024:1536, :]
    return jnp.where(pid == 1, q1, jnp.where(pid == 2, q2, q0))


def _dct_quantize_kernel8(x_ref, qt_ref, pid_ref, out_ref):
    """x [512, TP] i32 pixels element-major -> out [512, TP] i32 quantized
    coefficients in MESSAGE (zigzag) order.

    i32 I/O keeps every 8-row ref slice aligned to the (8, 128) vreg
    tile (u8/i16 tile 32/16 sublanes, so their 8-row slices straddle)."""
    qp = _qt_select(qt_ref, pid_ref).astype(F32)
    z = qp[0, 0] * F32(0)

    xs = [x_ref[8 * e:8 * e + 8, :].astype(F32) - F32(128)
          for e in range(64)]
    # stage 1: t = C . B; t elem (8i+j) = sum_k C[i,k] * B elem (8k+j)
    ts = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = (F32(float(_C_NP[i, 0])) * xs[j]) + z
            for k in range(1, 8):
                acc = acc + ((F32(float(_C_NP[i, k])) * xs[8 * k + j]) + z)
            ts[8 * i + j] = acc
    # stage 2: coef = t . C^T; coef elem (8i+j) = sum_k t(8i+k) * C[j,k]
    cs = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = (ts[8 * i] * F32(float(_C_NP[j, 0]))) + z
            for k in range(1, 8):
                acc = acc + ((ts[8 * i + k] * F32(float(_C_NP[j, k]))) + z)
            cs[8 * i + j] = acc
    # emit in message order: row group p holds element ZZ[p]; the qtable
    # rows are element-ordered, so permute them through the same zigzag
    coef = jnp.concatenate([cs[int(_ZZ[p])] for p in range(64)], axis=0)
    qz = jnp.concatenate([qp[8 * int(_ZZ[p]):8 * int(_ZZ[p]) + 8, :]
                          for p in range(64)], axis=0)
    out_ref[...] = kdev._exact_quantize(coef, qz).astype(I32)


def _dequantize_idct_kernel8(co_ref, qt_ref, pid_ref, out_ref):
    """co [512, TP] i32 coefficients in MESSAGE (zigzag) order ->
    out [512, TP] i32 pixel values (0..255) element-major."""
    qp = _qt_select(qt_ref, pid_ref).astype(F32)
    z = qp[0, 0] * F32(0)

    # dequantize on read: element e sits at input row group IZZ[e], and
    # its q value at qp row group e
    xs = [co_ref[8 * int(_IZZ[e]):8 * int(_IZZ[e]) + 8, :]
          .astype(F32) * qp[8 * e:8 * e + 8, :] for e in range(64)]
    # stage 1: t = C^T . X; t elem (8i+j) = sum_k C[k,i] * X elem (8k+j)
    ts = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = (F32(float(_C_NP[0, i])) * xs[j]) + z
            for k in range(1, 8):
                acc = acc + ((F32(float(_C_NP[k, i])) * xs[8 * k + j]) + z)
            ts[8 * i + j] = acc
    # stage 2: pix = T . C; pix elem (8i+j) = sum_k t(8i+k) * C[k,j]
    ps = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = (ts[8 * i] * F32(float(_C_NP[0, j]))) + z
            for k in range(1, 8):
                acc = acc + ((ts[8 * i + k] * F32(float(_C_NP[k, j]))) + z)
            ps[8 * i + j] = acc
    pix = jnp.concatenate(ps, axis=0)
    r = kdev.round_half_away(pix).astype(I32) + 128
    out_ref[...] = jnp.clip(r, 0, 255)


def pack_rows8(x: jnp.ndarray) -> jnp.ndarray:
    """[n, R] element-major block rows -> [R*8, n//8] packed layout
    (element e of block b at row 8e + b%8, lane column b//8)."""
    n, r = x.shape
    return x.T.reshape(r, n // 8, 8).transpose(0, 2, 1).reshape(
        r * 8, n // 8)


def unpack_rows8(xp: jnp.ndarray) -> jnp.ndarray:
    """[R*8, np8] packed -> [np8*8, R] block-major rows."""
    r8, np8 = xp.shape
    return xp.reshape(r8 // 8, 8, np8).transpose(2, 1, 0).reshape(
        np8 * 8, r8 // 8)


def plane_pids(ny: int, nc: int, pad_cols: int = 0) -> jnp.ndarray:
    """[1, ny//8 + 2*(nc//8) + pad_cols] i32 per-column plane ids for a
    frame's packed Y|U|V layout (pad columns tagged plane 0)."""
    return jnp.asarray(np.concatenate([
        np.zeros(ny // 8, np.int32), np.ones(nc // 8, np.int32),
        np.full(nc // 8, 2, np.int32),
        np.zeros(pad_cols, np.int32)])[None])


def expand_qtables(qts) -> jnp.ndarray:
    """[8, 8] tables (Y, U, V) -> [3*512, 1] f32 element-row expansion."""
    rows = [jnp.repeat(q.astype(F32).reshape(64), 8).reshape(512, 1)
            for q in qts]
    return jnp.concatenate(rows, axis=0)


def _call(kernel, x, qtx, pids, out_dtype, tile, interpret):
    ntp = x.shape[1]
    grid = (ntp // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((512, ntp), out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((512, tile), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((512, tile), lambda i: (0, i)),
        interpret=interpret,
    )(x, qtx, pids)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def dct_quantize_packed(pix8: jnp.ndarray, qtx: jnp.ndarray,
                        pids: jnp.ndarray, tile: int = TILE,
                        interpret: bool = False) -> jnp.ndarray:
    """[512, NTP] i32 packed pixels -> [512, NTP] i32 message-order coeffs.

    ``pids`` is [1, NTP] i32 plane ids (0/1/2) per lane column."""
    return _call(_dct_quantize_kernel8, pix8, qtx, pids, I32,
                 tile, interpret)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def dequantize_idct_packed(coef8: jnp.ndarray, qtx: jnp.ndarray,
                           pids: jnp.ndarray, tile: int = TILE,
                           interpret: bool = False) -> jnp.ndarray:
    """[512, NTP] i32 message-order coeffs -> [512, NTP] i32 pixels."""
    return _call(_dequantize_idct_kernel8, coef8, qtx, pids, I32,
                 tile, interpret)


# ---------------------------------------------------------------------------
# Word-packed variants: pixels 4-per-i32, coefficients 2-per-i32
# ---------------------------------------------------------------------------
#
# The [512, NTP] element-major interfaces move 4 HBM bytes per pixel
# byte; the relayouts around them were the measured bottleneck
# (tools/exp_packdct.py: pack 10.8 ms, unpackT 5.9 ms, unplane 7.2 ms
# per 4K frame vs <6 ms kernel compute). These variants keep every
# inter-stage tensor at information density: pixels ride as [128, NTP]
# quad-byte words (little-endian byte order — what
# jax.lax.bitcast_convert_type produces from the u8 plane), quantized
# coefficients as [256, NTP] i16 PAIRS in message order (rows 8p+s hold
# messages 2p | 2p+1 << 16 — the entropy encoder's pair input,
# entropy/pallas_encode.encode_words_pairs). The kernels unpack/pack
# with shifts: a few extra VPU ops for 2-4x less relayout traffic.


def _dctq_pairs(xw, qp_sel):
    """Shared fused-transform body: xw [128, TP] i32 pixel quad words +
    the block-selected qtable rows [512, TP] -> [256, TP] i32 quantized
    coefficient pairs in message order (same scalar op sequence as
    _dct_quantize_kernel8 — bit-exactness preserved). Also used by the
    fused DCT+Huffman-encode kernel (entropy/pallas_encode8).

    NO FMA-defeat adds: the round-4 toolchain does not contract
    mul+add chains into single-rounded FMAs (tools/exp_fma.py measured
    the bare 8-term chain bit-identical to the host double-rounded
    sequence; check_tpu_bitexact.py carries the sentinel probe), so
    the bare chain IS the reference's mulss/addss sequence. If the
    sentinel ever fails, restore the `+ z` (z = runtime zero) after
    every product — see kernels/device._seq_matmul."""
    qp = qp_sel.astype(F32)

    xs = [None] * 64
    for k in range(16):
        w = xw[8 * k:8 * k + 8, :]
        for j in range(4):
            xs[4 * k + j] = ((w >> (8 * j)) & 0xFF).astype(F32) - F32(128)
    ts = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = F32(float(_C_NP[i, 0])) * xs[j]
            for k in range(1, 8):
                acc = acc + (F32(float(_C_NP[i, k])) * xs[8 * k + j])
            ts[8 * i + j] = acc
    cs = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = ts[8 * i] * F32(float(_C_NP[j, 0]))
            for k in range(1, 8):
                acc = acc + (ts[8 * i + k] * F32(float(_C_NP[j, k])))
            cs[8 * i + j] = acc
    coef = jnp.concatenate([cs[int(_ZZ[p])] for p in range(64)], axis=0)
    qz = jnp.concatenate([qp[8 * int(_ZZ[p]):8 * int(_ZZ[p]) + 8, :]
                          for p in range(64)], axis=0)
    q = kdev._exact_quantize(coef, qz).astype(I32)
    pairs = [(q[16 * p:16 * p + 8, :] & 0xFFFF)
             | (q[16 * p + 8:16 * p + 16, :] << 16) for p in range(32)]
    return jnp.concatenate(pairs, axis=0)


def _dct_quantize_kernel8p(x_ref, qt_ref, pid_ref, out_ref):
    """x [128, TP] i32 pixel quad words -> out [256, TP] i32 coefficient
    pairs in message order (same math as _dct_quantize_kernel8)."""
    out_ref[...] = _dctq_pairs(x_ref[...], _qt_select(qt_ref, pid_ref))


def _idct_words(co, qp_sel):
    """Shared fused-inverse body: co [512, TP] i32 message-order coeff
    VALUES + block-selected qtable rows [512, TP] -> [128, TP] i32 pixel
    quad words (same scalar op sequence as _dequantize_idct_kernel8 —
    bit-exactness preserved). Also used by the fused Huffman-decode+IDCT
    kernel (entropy/pallas_decode8).

    NO FMA-defeat adds — see _dctq_pairs."""
    qp = qp_sel.astype(F32)

    xs = [co[8 * int(_IZZ[e]):8 * int(_IZZ[e]) + 8, :]
          .astype(F32) * qp[8 * e:8 * e + 8, :] for e in range(64)]
    ts = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = F32(float(_C_NP[0, i])) * xs[j]
            for k in range(1, 8):
                acc = acc + (F32(float(_C_NP[k, i])) * xs[8 * k + j])
            ts[8 * i + j] = acc
    ps = [None] * 64
    for i in range(8):
        for j in range(8):
            acc = ts[8 * i] * F32(float(_C_NP[0, j]))
            for k in range(1, 8):
                acc = acc + (ts[8 * i + k] * F32(float(_C_NP[k, j])))
            ps[8 * i + j] = acc
    pix = jnp.concatenate(ps, axis=0)
    r = jnp.clip(kdev.round_half_away(pix).astype(I32) + 128, 0, 255)
    words = [r[32 * k:32 * k + 8, :]
             | (r[32 * k + 8:32 * k + 16, :] << 8)
             | (r[32 * k + 16:32 * k + 24, :] << 16)
             | (r[32 * k + 24:32 * k + 32, :] << 24) for k in range(16)]
    return jnp.concatenate(words, axis=0)


def _dequantize_idct_kernel8p(co_ref, qt_ref, pid_ref, out_ref):
    """co [512, TP] i32 message-order coeffs -> out [128, TP] i32 pixel
    quad words (same math as _dequantize_idct_kernel8)."""
    out_ref[...] = _idct_words(co_ref[...], _qt_select(qt_ref, pid_ref))


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def dct_quantize_words(xw: jnp.ndarray, qtx: jnp.ndarray,
                       pids: jnp.ndarray, tile: int = TILE,
                       interpret: bool = False) -> jnp.ndarray:
    """[128, NTP] i32 pixel quad words -> [256, NTP] i32 message-order
    coefficient pairs."""
    ntp = xw.shape[1]
    return pl.pallas_call(
        _dct_quantize_kernel8p,
        out_shape=jax.ShapeDtypeStruct((256, ntp), I32),
        grid=(ntp // tile,),
        in_specs=[pl.BlockSpec((128, tile), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((256, tile), lambda i: (0, i)),
        interpret=interpret,
    )(xw, qtx, pids)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def dequantize_idct_words(coef8: jnp.ndarray, qtx: jnp.ndarray,
                          pids: jnp.ndarray, tile: int = TILE,
                          interpret: bool = False) -> jnp.ndarray:
    """[512, NTP] i32 message-order coeffs -> [128, NTP] pixel words."""
    ntp = coef8.shape[1]
    return pl.pallas_call(
        _dequantize_idct_kernel8p,
        out_shape=jax.ShapeDtypeStruct((128, ntp), I32),
        grid=(ntp // tile,),
        in_specs=[pl.BlockSpec((512, tile), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((128, tile), lambda i: (0, i)),
        interpret=interpret,
    )(coef8, qtx, pids)


# ---------------------------------------------------------------------------
# Plane <-> packed-word relayouts
# ---------------------------------------------------------------------------
#
# On TPU the relayout rides the MXU as 0/1-permutation matmuls over the
# plane's BYTE planes (bytes 0..255 are exact in bf16; every P column
# selects exactly one input word so the f32 accumulation is one exact
# byte): the XLA transpose formulations degenerate to 8-byte HBM runs
# (~14 GB/s effective; 57-63x their byte bound — the round-3 #1 cost),
# while the matmul route's only real data movement is a major-dims
# transpose with L*4-byte minor runs (measured ~2x faster per plane,
# tools/exp_r4pack.py; in-kernel fusion is impossible — Mosaic rejects
# every lane-stride primitive, tools/exp_r4lane.py).


def _perm_mxu(L: int) -> jnp.ndarray:
    """[16L, 16L] bf16 permutation: P[w, m] = 1 iff
    w = 16*(m % L) + 2*((m//L) % 8) + m//(8L) — the word w of a plane
    row feeding packed column slot m = (k1*8 + r)*L + c. Built from
    iota compares at trace time (a materialized literal of this size
    would bloat the executable)."""
    n = 16 * L
    w = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    src = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    return (w == src).astype(jnp.bfloat16)


def _perm2_mxu(L: int, wb: int):
    """2-row-unit variant for wb % 4 == 0 (e.g. 4K chroma, wb = 252):
    (P_lo, P_hi) [2wb, 16L] for the unit's first/second block row."""
    n = 16 * L
    w = jax.lax.broadcasted_iota(jnp.int32, (2 * wb, n), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (2 * wb, n), 1)
    c = m % L
    r = (m // L) % 8
    k1 = m // (8 * L)
    bb = 8 * c + r
    lo = bb < wb
    src = 2 * jnp.where(lo, bb, bb - wb) + k1
    return ((w == src) & lo).astype(jnp.bfloat16), \
        ((w == src) & ~lo).astype(jnp.bfloat16)


_HI = jax.lax.Precision.HIGHEST


def _pack_mxu(plane: jnp.ndarray) -> jnp.ndarray:
    h, w = plane.shape
    wb = w // 8
    L = wb // 8
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), jnp.int32)
    P = _perm_mxu(L)
    o = jnp.zeros((h, 2 * wb), jnp.int32)
    for j in range(4):
        bj = ((v >> (8 * j)) & 255).astype(jnp.bfloat16)
        oj = jnp.dot(bj, P, precision=_HI,
                     preferred_element_type=F32).astype(jnp.int32)
        o = o | (oj << (8 * j))
    return o.reshape(h // 8, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, (h // 8) * L)


def _unpack_mxu(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    wb = pw // 8
    L = wb // 8
    o = xw.reshape(8, 16, ph // 8, L).transpose(2, 0, 1, 3).reshape(
        ph, 2 * wb)
    # barrier: XLA otherwise sinks the transpose below the byte
    # extraction and transposes each bf16 byte plane separately (4
    # materialized copies at 2 B/elem instead of one at 4 B/elem)
    o = jax.lax.optimization_barrier(o)
    P = _perm_mxu(L)
    v = jnp.zeros((ph, 2 * wb), jnp.int32)
    for j in range(4):
        bj = ((o >> (8 * j)) & 255).astype(jnp.bfloat16)
        vj = jnp.dot(bj, P.T, precision=_HI,
                     preferred_element_type=F32).astype(jnp.int32)
        v = v | (vj << (8 * j))
    return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(ph, pw)


def _pack_mxu2(plane: jnp.ndarray) -> jnp.ndarray:
    h, w = plane.shape
    wb = w // 8
    L = wb // 4
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), jnp.int32)
    vu = v.reshape(h // 16, 2, 8, 2 * wb)
    A = vu[:, 0].reshape(h // 2, 2 * wb)
    B = vu[:, 1].reshape(h // 2, 2 * wb)
    Plo, Phi = _perm2_mxu(L, wb)
    o = jnp.zeros((h // 2, 16 * L), jnp.int32)
    for j in range(4):
        aj = ((A >> (8 * j)) & 255).astype(jnp.bfloat16)
        bj = ((B >> (8 * j)) & 255).astype(jnp.bfloat16)
        oj = (jnp.dot(aj, Plo, precision=_HI, preferred_element_type=F32)
              + jnp.dot(bj, Phi, precision=_HI,
                        preferred_element_type=F32)).astype(jnp.int32)
        o = o | (oj << (8 * j))
    return o.reshape(h // 16, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, (h // 16) * L)


def _unpack_mxu2(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    wb = pw // 8
    L = wb // 4
    o = xw.reshape(8, 16, ph // 16, L).transpose(2, 0, 1, 3).reshape(
        ph // 2, 16 * L)
    o = jax.lax.optimization_barrier(o)    # see _unpack_mxu
    Plo, Phi = _perm2_mxu(L, wb)
    A = jnp.zeros((ph // 2, 2 * wb), jnp.int32)
    B = jnp.zeros((ph // 2, 2 * wb), jnp.int32)
    for j in range(4):
        oj = ((o >> (8 * j)) & 255).astype(jnp.bfloat16)
        aj = jnp.dot(oj, Plo.T, precision=_HI,
                     preferred_element_type=F32).astype(jnp.int32)
        bj = jnp.dot(oj, Phi.T, precision=_HI,
                     preferred_element_type=F32).astype(jnp.int32)
        A = A | (aj << (8 * j))
        B = B | (bj << (8 * j))
    v = jnp.stack([A.reshape(ph // 16, 8, 2 * wb),
                   B.reshape(ph // 16, 8, 2 * wb)], axis=1)
    return jax.lax.bitcast_convert_type(
        v.reshape(ph, 2 * wb), jnp.uint8).reshape(ph, pw)


def _perm_val_mxu(L: int):
    """VALUE-input relayout matrices (round 5): (Plo, Phi) [64L, 16L]
    bf16 with weights {1, 256}, so o_lo[h, m] = px[4*src(m)] +
    256*px[4*src(m)+1] builds each packed word's low halfword straight
    from per-lane pixel VALUES — no u8->i32 bitcast repack (the 0.26
    ms/plane 'bitcast machinery' of the byte route, BENCH_r04). Values
    0..255 and the weight 256 are exact in bf16; products <= 65280 and
    halfword sums <= 65535 are exact in the f32 accumulator."""
    n = 16 * L
    p = jax.lax.broadcasted_iota(jnp.int32, (64 * L, n), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (64 * L, n), 1)
    src = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    base = 4 * src
    one = jnp.int32(1)
    lo = jnp.where(p == base, one, 0) + jnp.where(p == base + 1, 256, 0)
    hi = jnp.where(p == base + 2, one, 0) \
        + jnp.where(p == base + 3, 256, 0)
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def _perm_val_inv_mxu(L: int):
    """(Q0..Q3) [16L, 64L] bf16: pixel column p reads byte j of word
    m with p == 4*src(m) + j (the unpack direction of _perm_val_mxu)."""
    n = 16 * L
    m = jax.lax.broadcasted_iota(jnp.int32, (n, 64 * L), 0)
    p = jax.lax.broadcasted_iota(jnp.int32, (n, 64 * L), 1)
    src = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    return [(p == 4 * src + j).astype(jnp.bfloat16) for j in range(4)]


def _perm2_val_mxu(L: int, wb: int):
    """2-row-unit VALUE variants for wb % 4 == 0 (4K chroma):
    (PA_lo, PA_hi, PB_lo, PB_hi) [8wb, 16L]."""
    n = 16 * L
    wpx = 8 * wb
    p = jax.lax.broadcasted_iota(jnp.int32, (wpx, n), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (wpx, n), 1)
    c = m % L
    r = (m // L) % 8
    k1 = m // (8 * L)
    bb = 8 * c + r
    lo_unit = bb < wb
    base = 4 * (2 * jnp.where(lo_unit, bb, bb - wb) + k1)
    one = jnp.int32(1)

    def wsel(off0, off1, unit):
        sel = (jnp.where(p == base + off0, one, 0)
               + jnp.where(p == base + off1, 256, 0))
        return jnp.where(unit, sel, 0).astype(jnp.bfloat16)

    return (wsel(0, 1, lo_unit), wsel(2, 3, lo_unit),
            wsel(0, 1, ~lo_unit), wsel(2, 3, ~lo_unit))


def _perm2_val_inv_mxu(L: int, wb: int):
    """Inverse 2-row-unit VALUE variants: (QA[4], QB[4]) [16L, 8wb]."""
    n = 16 * L
    wpx = 8 * wb
    m = jax.lax.broadcasted_iota(jnp.int32, (n, wpx), 0)
    p = jax.lax.broadcasted_iota(jnp.int32, (n, wpx), 1)
    c = m % L
    r = (m // L) % 8
    k1 = m // (8 * L)
    bb = 8 * c + r
    lo_unit = bb < wb
    base = 4 * (2 * jnp.where(lo_unit, bb, bb - wb) + k1)
    qa = [((p == base + j) & lo_unit).astype(jnp.bfloat16)
          for j in range(4)]
    qb = [((p == base + j) & ~lo_unit).astype(jnp.bfloat16)
          for j in range(4)]
    return qa, qb


def _pack_val_mxu(vals: jnp.ndarray) -> jnp.ndarray:
    h, w = vals.shape
    L = w // 64
    x = vals.astype(jnp.bfloat16)
    Plo, Phi = _perm_val_mxu(L)
    lo = jnp.dot(x, Plo, precision=_HI,
                 preferred_element_type=F32).astype(jnp.int32)
    hi = jnp.dot(x, Phi, precision=_HI,
                 preferred_element_type=F32).astype(jnp.int32)
    o = lo | (hi << 16)
    return o.reshape(h // 8, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, (h // 8) * L)


def _unpack_val_mxu(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    L = pw // 64
    o = xw.reshape(8, 16, ph // 8, L).transpose(2, 0, 1, 3).reshape(
        ph, 16 * L)
    o = jax.lax.optimization_barrier(o)    # see _unpack_mxu
    Q = _perm_val_inv_mxu(L)
    bs = [(o & 255), (o >> 8) & 255, (o >> 16) & 255,
          jax.lax.shift_right_logical(o, 24)]
    pix = jnp.zeros((ph, pw), F32)
    for j in range(4):
        pix = pix + jnp.dot(bs[j].astype(jnp.bfloat16), Q[j],
                            precision=_HI, preferred_element_type=F32)
    return pix.astype(jnp.int32)


def _pack2_val_mxu(vals: jnp.ndarray) -> jnp.ndarray:
    h, w = vals.shape
    wb = w // 8
    L = wb // 4
    vu = vals.reshape(h // 16, 2, 8, w)
    A = vu[:, 0].reshape(h // 2, w).astype(jnp.bfloat16)
    B = vu[:, 1].reshape(h // 2, w).astype(jnp.bfloat16)
    PA_lo, PA_hi, PB_lo, PB_hi = _perm2_val_mxu(L, wb)

    def dd(x, P):
        return jnp.dot(x, P, precision=_HI, preferred_element_type=F32)

    lo = (dd(A, PA_lo) + dd(B, PB_lo)).astype(jnp.int32)
    hi = (dd(A, PA_hi) + dd(B, PB_hi)).astype(jnp.int32)
    o = lo | (hi << 16)
    return o.reshape(h // 16, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, (h // 16) * L)


def _unpack2_val_mxu(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    wb = pw // 8
    L = wb // 4
    o = xw.reshape(8, 16, ph // 16, L).transpose(2, 0, 1, 3).reshape(
        ph // 2, 16 * L)
    o = jax.lax.optimization_barrier(o)
    QA, QB = _perm2_val_inv_mxu(L, wb)
    bs = [(o & 255), (o >> 8) & 255, (o >> 16) & 255,
          jax.lax.shift_right_logical(o, 24)]
    A = jnp.zeros((ph // 2, pw), F32)
    B = jnp.zeros((ph // 2, pw), F32)
    for j in range(4):
        bj = bs[j].astype(jnp.bfloat16)
        A = A + jnp.dot(bj, QA[j], precision=_HI,
                        preferred_element_type=F32)
        B = B + jnp.dot(bj, QB[j], precision=_HI,
                        preferred_element_type=F32)
    v = jnp.stack([A.astype(jnp.int32).reshape(ph // 16, 8, pw),
                   B.astype(jnp.int32).reshape(ph // 16, 8, pw)],
                  axis=1)
    return v.reshape(ph, pw)


# Negative result (round 5, kept so nobody retries it): a HALFWORD
# unpack route — pixel-PAIR dots at half output width (half the MXU
# FLOPs) + one u16 -> u8 bitcast split — is exact but SLOWER than the
# byte route: 0.661 vs 0.325 ms/4K luma and 1.07 vs 0.222 chroma (the
# sub-32-bit bitcast repack and narrow dots eat the FLOP saving).


def pack_value_words(vals: jnp.ndarray) -> jnp.ndarray:
    """[H, W] i32 pixel VALUES (0..255) -> [128, N/8] i32 pixel quad
    words (same output as pack_pixel_words on the u8 plane) without the
    u8->word bitcast repack: the lane->byte combine rides the weighted
    MXU permutation (exact — see _perm_val_mxu). Conversion kernels
    keep their computed values in lanes and pack straight into the
    word-frame layout."""
    h, w = vals.shape
    wb = w // 8
    if jax.default_backend() not in ("cpu",):
        if wb % 8 == 0:
            return _pack_val_mxu(vals)
        if wb % 4 == 0:
            return _pack2_val_mxu(vals)
    return pack_pixel_words(vals.astype(jnp.uint8))


def unpack_value_words(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """[128, n/8] i32 pixel quad words -> [ph, pw] i32 pixel VALUES
    (the unpack direction of pack_value_words; feeds conversion math
    without materializing a u8 plane)."""
    wb = pw // 8
    if jax.default_backend() not in ("cpu",):
        if wb % 8 == 0:
            return _unpack_val_mxu(xw, ph, pw)
        if wb % 4 == 0:
            return _unpack2_val_mxu(xw, ph, pw)
    return unpack_pixel_words(xw, ph, pw).astype(jnp.int32)


def pack_pixel_words(plane: jnp.ndarray) -> jnp.ndarray:
    """[H, W] u8 plane -> [128, N/8] i32 pixel quad words (packed-8
    layout, 4 consecutive row pixels per word, little-endian).

    TPU: MXU permutation route (see above). CPU/fallback: the 5D
    transpose (wb % 8 == 0) or the two-hop block-major route."""
    h, w = plane.shape
    n = (h // 8) * (w // 8)
    wb = w // 8
    if jax.default_backend() not in ("cpu",):
        # VALUE route (round 5): the u8 -> bf16 cast feeding the
        # weighted dots is cheaper than the u8 -> i32 word-bitcast
        # machinery of the byte route (0.360 vs 0.489 ms/4K luma,
        # identical output — the experiment that motivated
        # pack_value_words applies to plain planes too)
        if wb % 8 == 0:
            return _pack_val_mxu(plane)
        if wb % 4 == 0:
            return _pack2_val_mxu(plane)
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), jnp.int32)         # [H, W/4]
    if wb % 8 == 0:
        t = v.reshape(h // 8, 8, wb // 8, 8, 2).transpose(1, 4, 3, 0, 2)
        return t.reshape(128, n // 8)
    b16 = v.reshape(h // 8, 8, wb, 2).transpose(0, 2, 1, 3).reshape(
        n, 16)
    return pack_rows8(b16)


def unpack_pixel_words(xw: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """[128, n/8] i32 pixel quad words -> [ph, pw] u8 plane.

    TPU: MXU permutation route (see above). CPU/fallback: the 5D
    transpose (wb % 8 == 0) or unpack_rows8 + blocks_to_plane."""
    n = xw.shape[1] * 8
    wb = pw // 8
    if jax.default_backend() not in ("cpu",):
        if wb % 8 == 0:
            return _unpack_mxu(xw, ph, pw)
        if wb % 4 == 0:
            return _unpack_mxu2(xw, ph, pw)
    if wb % 8 == 0:
        v = xw.reshape(8, 2, 8, ph // 8, wb // 8).transpose(
            3, 0, 4, 2, 1).reshape(ph, pw // 4)
        return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(ph, pw)
    b16 = unpack_rows8(xw)                              # [n, 16]
    b = jax.lax.bitcast_convert_type(b16, jnp.uint8)    # [n, 16, 4]
    return kdev.blocks_to_plane(b.reshape(n, 8, 8), ph, pw)
