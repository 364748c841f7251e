"""Pallas TPU kernels: fused blocked DCT+quantize and dequantize+IDCT.

The hot transform ops as hand-tiled TPU kernels (SURVEY.md §2.2 items 2-3).
The XLA path (kernels/device.py) materializes the 15-step sequential-matmul
intermediates in HBM; here each [TILE, 64] row-tile of blocks stays in VMEM
through centering, both 8x8 matmuls, and quantization, so HBM traffic drops
to the u8 inputs + i16 outputs.

Bit-exactness carries over: the same sequential f32 accumulation with the
runtime-zero FMA defeat (device._seq_matmul) and the division-free
boundary-exact quantizer (device._exact_quantize) — Mosaic compiles Pallas
bodies with the same FMA/division behavior as the XLA backend, so the same
countermeasures apply (validated by tests/test_pallas_dct.py and
tools/check_tpu_bitexact.py).

Blocks are laid out as [N, 64] rows (row-major 8x8); TILE rows per grid
step. Use ``interpret=True`` off-TPU (the CPU test path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import device as kdev
from .constants import DCT_MATRIX8
import numpy as np

F32 = jnp.float32
TILE = 512


# this JAX version disallows array constants inside Pallas kernels, so the
# DCT matrix and its transpose ride in as ordinary (whole-array) inputs
_C_NP = DCT_MATRIX8
_CT_NP = np.ascontiguousarray(DCT_MATRIX8.T)


# Mosaic restrictions shape the kernel bodies: no 3D vectors (everything
# stays [TILE, 64] flat with static 8-column slices standing in for the
# block's rows/columns), and no direct u8<->f32 casts (hop through int32).
# The arithmetic replays the reference's sequential ascending-k f32
# accumulation per output element, with the runtime-zero FMA defeat.


def _flat_dct(x, cm_np, z):
    """x [TILE, 64] = row-major 8x8 blocks; returns cm . B per block.

    ``cm_np`` is a NUMPY matrix: its entries become scalar f32 literals
    (Mosaic rejects captured array constants and cannot broadcast [1,1]
    vector slices, but scalar-times-vector is native).
    """
    cols = []
    for i in range(8):
        acc = (F32(float(cm_np[i, 0])) * x[:, 0:8]) + z
        for k in range(1, 8):
            acc = acc + ((F32(float(cm_np[i, k])) * x[:, 8 * k:8 * k + 8]) + z)
        cols.append(acc)
    return jnp.concatenate(cols, axis=1)


def _flat_dct_rows(t, rowmat, z):
    """t [TILE, 64]; out[:, 8i+j] = sum_k t[:, 8i+k] * rowmat[k, j].

    ``rowmat[k:k+1, :]`` row slices avoid Mosaic-unsupported reshapes.
    """
    cols = []
    for i in range(8):
        ti = t[:, 8 * i:8 * i + 8]
        acc = (ti[:, 0:1] * rowmat[0:1, :]) + z
        for k in range(1, 8):
            acc = acc + ((ti[:, k:k + 1] * rowmat[k:k + 1, :]) + z)
        cols.append(acc)
    return jnp.concatenate(cols, axis=1)


def _dct_quantize_kernel(x_ref, qt_ref, c_ref, ct_ref, out_ref):
    x = x_ref[...].astype(jnp.int32).astype(F32) - F32(128)
    qtf = qt_ref[...].astype(F32)            # [1, 64] (pre-flattened)
    z = qt_ref[0, 0] * F32(0)
    t = _flat_dct(x, _C_NP, z)
    # coef = T . C^T: needed row over j for step k is C^T[k, :]
    coef = _flat_dct_rows(t, ct_ref[...], z)
    out_ref[...] = kdev._exact_quantize(coef, qtf)


def _dequantize_idct_kernel(co_ref, qt_ref, cmat_ref, ct_ref, out_ref):
    qtf = qt_ref[...].astype(F32)            # [1, 64]
    x = co_ref[...].astype(jnp.int32).astype(F32) * qtf
    z = qt_ref[0, 0] * F32(0)
    t = _flat_dct(x, _CT_NP, z)              # C^T . X
    pix = _flat_dct_rows(t, cmat_ref[...], z)  # (C^T X) . C: rows of C
    r = kdev.round_half_away(pix).astype(jnp.int32) + 128
    out_ref[...] = jnp.clip(r, 0, 255).astype(jnp.uint8)


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def dct_quantize_rows(blocks_u8: jnp.ndarray, qtable: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """[N, 64] u8 block rows -> [N, 64] i16 quantized coefficients."""
    x, n = _pad_rows(blocks_u8, TILE)
    grid = (x.shape[0] // TILE,)
    out = pl.pallas_call(
        _dct_quantize_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
                  pl.BlockSpec((1, 64), lambda i: (0, 0)),
                  pl.BlockSpec((8, 8), lambda i: (0, 0)),
                  pl.BlockSpec((8, 8), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
        interpret=interpret,
    )(x, qtable.astype(F32).reshape(1, 64), jnp.asarray(_C_NP),
      jnp.asarray(_CT_NP))
    return out[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequantize_idct_rows(coeffs: jnp.ndarray, qtable: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """[N, 64] i16 coefficients -> [N, 64] u8 pixel block rows."""
    x, n = _pad_rows(coeffs, TILE)
    grid = (x.shape[0] // TILE,)
    out = pl.pallas_call(
        _dequantize_idct_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
                  pl.BlockSpec((1, 64), lambda i: (0, 0)),
                  pl.BlockSpec((8, 8), lambda i: (0, 0)),
                  pl.BlockSpec((8, 8), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
        interpret=interpret,
    )(x, qtable.astype(F32).reshape(1, 64), jnp.asarray(_C_NP),
      jnp.asarray(_CT_NP))
    return out[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dct_quantize_plane(plane: jnp.ndarray, qtable: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """[H, W] u8 plane -> [N, 8, 8] i16 coefficients (raster blocks)."""
    blocks = kdev.plane_to_blocks(plane)
    n = blocks.shape[0]
    out = dct_quantize_rows(blocks.reshape(n, 64), qtable,
                            interpret=interpret)
    return out.reshape(n, 8, 8)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def dequantize_idct_plane(coeffs: jnp.ndarray, qtable: jnp.ndarray,
                          h: int, w: int,
                          interpret: bool = False) -> jnp.ndarray:
    """[N, 8, 8] i16 -> [H, W] u8 plane."""
    n = coeffs.shape[0]
    out = dequantize_idct_rows(coeffs.reshape(n, 64), qtable,
                               interpret=interpret)
    return kdev.blocks_to_plane(out.reshape(n, 8, 8), h, w)
