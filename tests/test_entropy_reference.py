"""Per-block Huffman oracle tests: roundtrip + format-contract properties."""

import numpy as np
import pytest

from myyuv_tpu.entropy import reference as ent


def random_blocks(rng, n, density=0.3, lo=-1024, hi=1023):
    blocks = np.zeros((n, 64), np.int16)
    mask = rng.random((n, 64)) < density
    vals = rng.integers(lo, hi + 1, (n, 64))
    blocks[mask] = vals[mask].astype(np.int16)
    return blocks


def test_zigzag_is_permutation():
    assert sorted(ent.ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(ent.ZIGZAG[ent.INV_ZIGZAG], np.arange(64))


@pytest.mark.parametrize("density", [0.0, 0.05, 0.3, 1.0])
def test_roundtrip_random(rng, density):
    blocks = random_blocks(rng, 64, density)
    for b in blocks:
        chunk = ent.encode_block(b)
        assert 3 <= len(chunk) <= 255
        out = ent.decode_block(chunk)
        assert np.array_equal(out, b)


def test_all_zero_block():
    chunk = ent.encode_block(np.zeros(64, np.int16))
    # all-zero block encodes a single 0 symbol with code length 1
    enc_bits = int.from_bytes(chunk[:2], "little")
    assert enc_bits == 1
    assert np.array_equal(ent.decode_block(chunk), np.zeros(64))


def test_single_nonzero_dc():
    b = np.zeros(64, np.int16)
    b[0] = -1024
    out = ent.decode_block(ent.encode_block(b))
    assert np.array_equal(out, b)


def test_extreme_values():
    b = np.full(64, 1023, np.int16)
    b[ent.ZIGZAG[63]] = -1024
    out = ent.decode_block(ent.encode_block(b))
    assert np.array_equal(out, b)


def test_max_code_length_le_8(rng):
    """Total message weight <= 64 < Fib(11)=89 bounds Huffman depth at 8."""
    # adversarial: near-Fibonacci frequency pattern maximizes depth
    msg = []
    for sym, f in enumerate([1, 1, 2, 3, 5, 8, 13, 21, 10]):
        msg += [sym + 1] * f
    b = np.zeros(64, np.int16)
    b[ent.ZIGZAG[:len(msg)]] = msg
    tree = ent.block_tree_data(b)
    assert max(tree) <= 8
    assert np.array_equal(ent.decode_block(ent.encode_block(b)), b)


def test_many_distinct_symbols():
    # 64 distinct symbols, freq 1 each -> 6-bit balanced-ish codes, two
    # subgroups (>32 symbols of one length) exercise group splitting
    b = np.arange(64, dtype=np.int16) - 32
    b[b == 0] = 64  # keep trailing symbol nonzero
    out = ent.decode_block(ent.encode_block(b))
    assert np.array_equal(out, b)


def test_canonical_codes_prefix_free(rng):
    blocks = random_blocks(rng, 16, 0.5)
    for b in blocks:
        tree = ent.block_tree_data(b)
        codes = ent.canonical_codes(tree)
        items = sorted(((l, c) for (l, c) in codes.values()))
        # Kraft inequality and prefix-freeness
        kraft = sum(2.0 ** -l for l, _ in items)
        assert kraft <= 1.0 + 1e-12
        as_bits = [format(c, f"0{l}b") for l, c in items]
        for i, a in enumerate(as_bits):
            for bb in as_bits[i + 1:]:
                assert not bb.startswith(a)
