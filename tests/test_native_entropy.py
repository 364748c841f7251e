"""Native (C++) entropy codec vs the per-block Python oracle."""

import numpy as np
import pytest

from myyuv_tpu import native
from myyuv_tpu.entropy import (decode_blocks_py, encode_blocks_py, reference)
from myyuv_tpu.runtime.errors import BitstreamError


@pytest.fixture(scope="module")
def nat():
    if not native.available():
        pytest.skip("native entropy library unavailable")
    return native


def _blocks(rng, n=512, density=0.2, lo=-1024, hi=1024):
    c = rng.integers(lo, hi, size=(n, 64))
    mask = rng.random((n, 64)) < density
    return (c * mask).astype(np.int16)


def test_native_roundtrip(nat, rng):
    coeffs = _blocks(rng)
    coeffs[0] = 0                      # all-zero block
    coeffs[1] = -1024                  # extreme symbols, dense
    coeffs[2, :] = 1023
    sizes, content = nat.encode_blocks(coeffs)
    dec = nat.decode_blocks(sizes, content)
    np.testing.assert_array_equal(dec, coeffs)


def test_oracle_decodes_native(nat, rng):
    coeffs = _blocks(rng, 128)
    sizes, content = nat.encode_blocks(coeffs)
    dec = decode_blocks_py(sizes, content)
    np.testing.assert_array_equal(dec, coeffs.reshape(-1, 64))


def test_native_decodes_oracle(nat, rng):
    coeffs = _blocks(rng, 128)
    sizes, content = encode_blocks_py(coeffs)
    dec = nat.decode_blocks(sizes, content)
    np.testing.assert_array_equal(dec, coeffs.reshape(-1, 64))


def test_optimal_length_parity(nat, rng):
    """Native chunks are byte-count-identical to the oracle's (both build
    optimal Huffman lengths; canonical assignment fixes the rest)."""
    coeffs = _blocks(rng, 256)
    ns, _ = nat.encode_blocks(coeffs)
    ps, _ = encode_blocks_py(coeffs)
    np.testing.assert_array_equal(ns, ps)


def test_native_rejects_corrupt(nat, rng):
    coeffs = _blocks(rng, 4)
    sizes, content = nat.encode_blocks(coeffs)
    bad = content.copy()
    bad[0] = 255  # clobber first chunk's enc_bits
    with pytest.raises(BitstreamError):
        nat.decode_blocks(sizes, bad[: sizes.astype(np.int64).sum() - 1])


def test_single_symbol_and_saturation(nat):
    # single nonzero symbol at the end of the zigzag; length-1 code path
    c = np.zeros((3, 64), np.int16)
    c[0, reference.ZIGZAG[63]] = 5
    c[1, reference.ZIGZAG[0]] = -7
    sizes, content = nat.encode_blocks(c)
    np.testing.assert_array_equal(nat.decode_blocks(sizes, content), c)
