"""Pallas Huffman decoder vs the native/py encoders (interpret mode)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import native  # noqa: E402
from myyuv_tpu.entropy import encode_blocks_py, pallas_decode  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTPlaneStream  # noqa: E402


def _blocks(rng, n=300):
    c = (rng.integers(-1024, 1024, (n, 64))
         * (rng.random((n, 64)) < 0.25)).astype(np.int16)
    c[0] = 0
    c[1] = 1023
    c[2] = -1024
    c[3, :] = 0
    c[3, 0] = 5    # single symbol
    return c


def test_decodes_native_encoded(rng):
    coeffs = _blocks(rng)
    if native.available():
        sizes, content = native.encode_blocks(coeffs)
    else:
        sizes, content = encode_blocks_py(coeffs)
    lanes = DCTPlaneStream(sizes, content).to_lanes()
    dec, ok = pallas_decode.decode_lanes(jnp.asarray(lanes), interpret=True)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), coeffs)


def test_corrupt_flagged(rng):
    coeffs = _blocks(rng, 64)
    sizes, content = encode_blocks_py(coeffs)
    lanes = DCTPlaneStream(sizes, content).to_lanes()
    lanes[5, 0] ^= 0xFF
    _, ok = pallas_decode.decode_lanes(jnp.asarray(lanes), interpret=True)
    ok = np.asarray(ok)
    assert not ok[5]
    assert ok[6:].all()


def test_small_table_branch_decode(rng):
    """Small-alphabet tiles take the payload kernel's [16, TILE] table
    branch; decode must stay exact with ok all-True."""
    import jax.numpy as jnp
    from myyuv_tpu.entropy import device as edev, pallas_decode
    c = (rng.integers(-4, 5, (256, 64))
         * (rng.random((256, 64)) < 0.15)).astype(np.int16)
    c[0] = 0
    lanes, sizes, ok = edev.encode_lanes(jnp.asarray(c))
    out, dok = pallas_decode.decode_lanes(jnp.asarray(lanes),
                                          interpret=True)
    assert np.asarray(dok).all()
    np.testing.assert_array_equal(np.asarray(out), c)
