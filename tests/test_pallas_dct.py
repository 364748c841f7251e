"""Pallas DCT kernels vs the scalar oracle (interpret mode on CPU;
tools/check_tpu_bitexact.py covers the compiled-on-TPU check)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.kernels import pallas_dct, scalar  # noqa: E402


@pytest.mark.parametrize("quality,plane_i", [(50, 0), (90, 1)])
def test_pallas_fwd_bitexact(rng, quality, plane_i):
    blocks = rng.integers(0, 256, (700, 8, 8), np.uint8)
    qt = scalar.plane_qtable(plane_i, quality)
    got = np.asarray(pallas_dct.dct_quantize_rows(
        jnp.asarray(blocks.reshape(-1, 64)), jnp.asarray(qt),
        interpret=True))
    want = scalar.dct_quantize_blocks(blocks, qt).reshape(-1, 64)
    np.testing.assert_array_equal(got, want)


def test_pallas_inv_bitexact(rng):
    co = rng.integers(-1024, 1024, (700, 8, 8), np.int16)
    qt = scalar.plane_qtable(0, 50)
    got = np.asarray(pallas_dct.dequantize_idct_rows(
        jnp.asarray(co.reshape(-1, 64)), jnp.asarray(qt), interpret=True))
    want = scalar.dequantize_idct_blocks(co, qt).reshape(-1, 64)
    np.testing.assert_array_equal(got, want)


def test_pallas_plane_roundtrip(rng):
    h, w = 64, 128
    plane = rng.integers(0, 256, (h, w), np.uint8)
    qt = scalar.plane_qtable(0, 50)
    co = pallas_dct.dct_quantize_plane(jnp.asarray(plane), jnp.asarray(qt),
                                       interpret=True)
    rec = np.asarray(pallas_dct.dequantize_idct_plane(
        co, jnp.asarray(qt), h, w, interpret=True))
    want_co = scalar.dct_quantize_blocks(scalar.plane_to_blocks(plane), qt)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(want_co, qt), h, w)
    np.testing.assert_array_equal(rec, want)
