"""Scalar/NumPy implementation of the compute kernels (exact semantics).

This module is the numerical ground truth for the JAX/Pallas kernels and the
host (CPU) fallback path. Every operation reproduces the reference's float32
arithmetic step for step:

* RGB->IYUV: myyuv_yuv.cpp:34-52 (getYUV444FromRGB2x2) and 108-124 (the 2x2
  subsampling loop), including truncating float->uint8 casts with two's
  complement wraparound and the per-sample `divide_roundnearest(c, 4)` sum.
* forward DCT + quantize: DCT.cpp:269-323 — two sequential float32 8x8
  matmuls (C.B then (C.B).C^T), accumulation in ascending-k order, then
  `int16(std::round(x / q))` with round-half-away-from-zero.
* dequantize + inverse DCT: DCT.cpp:325-365 — C^T.X then (C^T.X).C, then
  `clamp(round(x) + 128, 0, 255)`.

NumPy float32 elementwise ops round per-operation exactly like the
reference's scalar SSE code (no FMA contraction), so equality is exact, not
approximate.
"""

from __future__ import annotations

import numpy as np

from .constants import DCT_MATRIX8, PLANE_Q50, quality_scaled_qtable

F32 = np.float32


def round_half_away_f32(x: np.ndarray) -> np.ndarray:
    """Exact float32 std::round (half away from zero).

    Implemented as trunc + fractional compare: ``x - trunc(x)`` is exact in
    IEEE f32 (Sterbenz), and the |frac| >= 0.5 comparison is exact, unlike
    the classic ``floor(x + 0.5)`` which misrounds x = 0.5 - 2^-25.
    """
    r = np.trunc(x)
    f = x - r
    return r + np.where(np.abs(f) >= F32(0.5), np.sign(x), F32(0)).astype(F32)


# ---------------------------------------------------------------------------
# RGB -> IYUV 4:2:0
# ---------------------------------------------------------------------------

def bgrx_to_iyuv(pixels: np.ndarray):
    """[H, W, 4] uint8 BGRX (top-down) -> (Y [H,W], U [H/2,W/2], V [H/2,W/2]).

    Bit-exact model of the IYUV converter lambda (myyuv_yuv.cpp:88-127).
    """
    h, w = pixels.shape[:2]
    assert h % 2 == 0 and w % 2 == 0
    b = pixels[..., 0].astype(F32)
    g = pixels[..., 1].astype(F32)
    r = pixels[..., 2].astype(F32)
    # Y = 0.299 R + 0.587 G + 0.114 B, sequential f32 adds (myyuv_yuv.cpp:46)
    yf = (F32(0.299) * r + F32(0.587) * g) + F32(0.114) * b
    y = np.trunc(yf).astype(np.int32).astype(np.uint8)
    # Cb/Cr: truncating cast (toward zero; C++ UB-but-x86 semantics for
    # negatives) then +128 with uint8 wraparound (myyuv_yuv.cpp:48-49)
    cb = (np.trunc((b - yf) * F32(0.564)).astype(np.int32) + 128) & 255
    cr = (np.trunc((r - yf) * F32(0.713)).astype(np.int32) + 128) & 255
    # 4:2:0: sum of divide_roundnearest(c, 4) over each 2x2 quad with uint8
    # wraparound — NOT the rounded mean (myyuv_yuv.cpp:114-121)
    qcb = (cb + 2) >> 2
    qcr = (cr + 2) >> 2
    u = (qcb[0::2, 0::2] + qcb[0::2, 1::2] + qcb[1::2, 0::2] + qcb[1::2, 1::2]) & 255
    v = (qcr[0::2, 0::2] + qcr[0::2, 1::2] + qcr[1::2, 0::2] + qcr[1::2, 1::2]) & 255
    return y, u.astype(np.uint8), v.astype(np.uint8)


def iyuv_to_bgrx(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """IYUV planes -> [H, W, 4] uint8 BGRX preview.

    The RGB export math of the reference's GPU fragment shader
    (myyuv_opengl/viewer/frag_yuv.glsl): R = Y + 1.403 V', G = Y - 0.714 V'
    - 0.344 U', B = Y + 1.773 U' with U', V' centered at 0.5 — evaluated
    here in [0,255] space.
    """
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(F32)[:h, :w] - F32(128)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(F32)[:h, :w] - F32(128)
    yf = y.astype(F32)
    r = yf + F32(1.403) * vv
    g = yf - F32(0.714) * vv - F32(0.344) * uu
    b = yf + F32(1.773) * uu
    out = np.stack([b, g, r, np.full_like(yf, 255)], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Blocked DCT-II + quantization
# ---------------------------------------------------------------------------

def plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """[H, W] -> [H/8 * W/8, 8, 8] row-major 8x8 tiles.

    Block k of tile origin (i, j) satisfies k = (i + j*W/8)/8
    (DCT.cpp:308,355) — i.e. raster order over tiles.
    """
    h, w = plane.shape
    assert h % 8 == 0 and w % 8 == 0
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def blocks_to_plane(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(h, w))


def _seq_matmul_f32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched [N,8,8] @ [N,8,8] with ascending-k sequential f32 accumulation.

    Reproduces squareMatrixMul's rounding (DCT.cpp:232-242): acc is rounded
    to f32 after every multiply-add step, no reassociation, no FMA.
    """
    acc = a[..., :, 0:1] * b[..., 0:1, :]
    for k in range(1, 8):
        acc = acc + a[..., :, k:k + 1] * b[..., k:k + 1, :]
    return acc


def dct_quantize_blocks(blocks_u8: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """[N, 8, 8] uint8 pixels -> [N, 8, 8] int16 quantized coefficients.

    applyDCTBlock semantics (DCT.cpp:269-277): center by -128, C.B, then
    (C.B).C^T, divide by qtable, round half away from zero.
    """
    x = blocks_u8.astype(F32) - F32(128)
    c = DCT_MATRIX8[None]
    tmp = _seq_matmul_f32(np.broadcast_to(c, x.shape), x)       # C . B
    coef = _seq_matmul_f32(tmp, np.broadcast_to(
        np.ascontiguousarray(DCT_MATRIX8.T)[None], x.shape))    # (C.B) . C^T
    q = coef / qtable.astype(F32)[None]
    return round_half_away_f32(q).astype(np.int16)


def dequantize_idct_blocks(coeffs: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """[N, 8, 8] int16 coefficients -> [N, 8, 8] uint8 pixels.

    restoreDCTBlock semantics (DCT.cpp:325-335): dequantize, C^T.X, then
    (C^T.X).C, then clamp(round(x) + 128, 0, 255) (DCT.cpp:358-361).
    """
    x = coeffs.astype(F32) * qtable.astype(F32)[None]
    ct = np.ascontiguousarray(DCT_MATRIX8.T)[None]
    tmp = _seq_matmul_f32(np.broadcast_to(ct, x.shape), x)      # C^T . X
    pix = _seq_matmul_f32(tmp, np.broadcast_to(
        DCT_MATRIX8[None], x.shape))                            # (C^T.X) . C
    r = round_half_away_f32(pix).astype(np.int32) + 128
    return np.clip(r, 0, 255).astype(np.uint8)


def plane_qtable(plane_index: int, quality: int) -> np.ndarray:
    """Quality-scaled q-table for plane 0/1/2 (DCT.cpp:286-290,397)."""
    return quality_scaled_qtable(PLANE_Q50[plane_index], quality)
