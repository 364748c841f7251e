"""Packed-layout Pallas DCT kernels vs the scalar oracle (interpret)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.entropy.reference import ZIGZAG  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8, scalar  # noqa: E402

TILE = 16
ZZ = np.asarray(ZIGZAG, np.int64)


def _pack(x_n64):
    """[n, 64] -> [512, n//8] packed element-major (b = c*8 + r)."""
    n = x_n64.shape[0]
    return np.ascontiguousarray(
        x_n64.T.reshape(64, n // 8, 8).transpose(0, 2, 1).reshape(
            512, n // 8))


def _unpack(xp):
    np8 = xp.shape[1]
    return np.ascontiguousarray(
        xp.reshape(64, 8, np8).transpose(2, 1, 0).reshape(np8 * 8, 64))


def test_forward_matches_oracle(rng):
    n = 8 * TILE * 2
    blocks = rng.integers(0, 256, (n, 8, 8), np.uint8)
    qt_y = scalar.plane_qtable(0, 37)
    qt_u = scalar.plane_qtable(1, 90)
    pix8 = jnp.asarray(_pack(blocks.reshape(n, 64).astype(np.int32)))
    qtx = pallas_dct8.expand_qtables([jnp.asarray(qt_y), jnp.asarray(qt_u),
                                      jnp.asarray(qt_u)])
    pids = jnp.asarray(np.repeat([0, 1], TILE).astype(np.int32)[None])
    out = np.asarray(pallas_dct8.dct_quantize_packed(
        pix8, qtx, pids, tile=TILE, interpret=True))
    got = _unpack(out)                      # [n, 64] message order
    want_y = scalar.dct_quantize_blocks(blocks[:n // 2], qt_y)
    want_u = scalar.dct_quantize_blocks(blocks[n // 2:], qt_u)
    want = np.concatenate([want_y, want_u]).reshape(n, 64)[:, ZZ]
    np.testing.assert_array_equal(got, want)


def test_inverse_matches_oracle(rng):
    n = 8 * TILE * 2
    coeffs = rng.integers(-1024, 1024, (n, 8, 8), np.int16)
    qt_y = scalar.plane_qtable(0, 50)
    qt_v = scalar.plane_qtable(2, 10)
    msg = coeffs.reshape(n, 64)[:, ZZ].astype(np.int32)
    co8 = jnp.asarray(_pack(msg))
    qtx = pallas_dct8.expand_qtables([jnp.asarray(qt_y), jnp.asarray(qt_y),
                                      jnp.asarray(qt_v)])
    pids = jnp.asarray(np.repeat([0, 2], TILE).astype(np.int32)[None])
    out = np.asarray(pallas_dct8.dequantize_idct_packed(
        co8, qtx, pids, tile=TILE, interpret=True))
    got = _unpack(out).astype(np.uint8)
    want_y = scalar.dequantize_idct_blocks(coeffs[:n // 2], qt_y)
    want_v = scalar.dequantize_idct_blocks(coeffs[n // 2:], qt_v)
    want = np.concatenate([want_y, want_v]).reshape(n, 64)
    np.testing.assert_array_equal(got, want)


def test_roundtrip_packed(rng):
    n = 8 * TILE
    blocks = rng.integers(0, 256, (n, 8, 8), np.uint8)
    qt = scalar.plane_qtable(0, 75)
    pix8 = jnp.asarray(_pack(blocks.reshape(n, 64).astype(np.int32)))
    qtx = pallas_dct8.expand_qtables([jnp.asarray(qt)] * 3)
    pids = jnp.asarray(np.zeros((1, TILE), np.int32))
    co = pallas_dct8.dct_quantize_packed(pix8, qtx, pids, tile=TILE,
                                         interpret=True)
    rec = np.asarray(pallas_dct8.dequantize_idct_packed(
        co, qtx, pids, tile=TILE, interpret=True))
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(blocks, qt), qt),
        8, n * 8)
    got = scalar.blocks_to_plane(
        _unpack(rec).astype(np.uint8).reshape(n, 8, 8), 8, n * 8)
    np.testing.assert_array_equal(got, want)
