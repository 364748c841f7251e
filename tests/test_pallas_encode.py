"""Pallas Huffman encoder vs the XLA encoder / oracle decoders
(interpret mode; the real-chip check lives in tools/check_tpu_bitexact.py).
"""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.entropy import (decode_blocks_py, device as edev,  # noqa: E402
                               pallas_encode)
from myyuv_tpu.formats.dct_stream import DCTPlaneStream  # noqa: E402


def _blocks(rng, n=300):
    c = (rng.integers(-1024, 1024, (n, 64))
         * (rng.random((n, 64)) < 0.25)).astype(np.int16)
    c[0] = 0          # all-zero block -> single 0 symbol
    c[1] = 1023       # dense single-symbol extremes
    c[2] = -1024
    c[3, :] = 0
    c[3, 0] = 5       # single-symbol message
    c[4] = rng.integers(-1024, 1024, 64)  # dense, near-worst-case tree
    return c


def test_byte_identical_to_xla_encoder(rng):
    coeffs = _blocks(rng)
    lanes_p, sizes_p, ok_p = pallas_encode.encode_lanes(
        jnp.asarray(coeffs), interpret=True)
    lanes_x, sizes_x, ok_x = edev.encode_lanes(jnp.asarray(coeffs))
    np.testing.assert_array_equal(np.asarray(sizes_p), np.asarray(sizes_x))
    assert np.asarray(ok_p).all() and np.asarray(ok_x).all()
    lp, lx = np.asarray(lanes_p), np.asarray(lanes_x)
    sz = np.asarray(sizes_p)
    for i in range(coeffs.shape[0]):
        np.testing.assert_array_equal(lp[i, :sz[i]], lx[i, :sz[i]],
                                      err_msg=f"block {i}")


def test_oracle_decodes_pallas_encoded(rng):
    coeffs = _blocks(rng, 128)
    lanes, sizes, ok = pallas_encode.encode_lanes(
        jnp.asarray(coeffs), interpret=True)
    assert np.asarray(ok).all()
    st = DCTPlaneStream.from_lanes(np.asarray(lanes),
                                   np.asarray(sizes).astype(np.uint8))
    dec = decode_blocks_py(st.chunk_sizes, st.content)
    np.testing.assert_array_equal(dec, coeffs)


def test_small_table_branch_byte_identical(rng):
    """Tiles whose largest tree has <= 16 symbols take the specialized
    [16, TILE] tail (lax.cond) — must stay byte-identical."""
    c = (rng.integers(-4, 5, (256, 64))
         * (rng.random((256, 64)) < 0.15)).astype(np.int16)
    c[0] = 0
    lanes_p, sizes_p, ok_p = pallas_encode.encode_lanes(
        jnp.asarray(c), interpret=True)
    lanes_x, sizes_x, ok_x = edev.encode_lanes(jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(sizes_p), np.asarray(sizes_x))
    lp, lx = np.asarray(lanes_p), np.asarray(lanes_x)
    sz = np.asarray(sizes_p)
    for i in range(c.shape[0]):
        np.testing.assert_array_equal(lp[i, :sz[i]], lx[i, :sz[i]],
                                      err_msg=f"block {i}")
