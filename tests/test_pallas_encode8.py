"""Packed-8 Pallas Huffman encoder vs the flat Pallas / XLA encoders
(interpret mode; the real-chip check lives in tools/check_tpu_bitexact.py).

Reference semantics: Huffman.cpp:172-241,279-326 — byte-identical streams.
"""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.entropy import (decode_blocks_py, device as edev,  # noqa: E402
                               pallas_encode, pallas_encode8)
from myyuv_tpu.entropy.pallas_decode8 import pack8_rows  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTPlaneStream  # noqa: E402


def _blocks(rng, n=256):
    c = (rng.integers(-1024, 1024, (n, 64))
         * (rng.random((n, 64)) < 0.25)).astype(np.int16)
    c[0] = 0          # all-zero block -> single 0 symbol
    c[1] = 1023       # dense single-symbol extremes
    c[2] = -1024
    c[3, :] = 0
    c[3, 0] = 5       # single-symbol message
    c[4] = rng.integers(-1024, 1024, 64)  # dense, near-worst-case tree
    return c


def test_byte_identical_to_flat_pallas_encoder(rng):
    coeffs = _blocks(rng)
    lanes_p, sizes_p, ok_p = pallas_encode8.encode_lanes8(
        jnp.asarray(coeffs), interpret=True)
    lanes_f, sizes_f, ok_f = pallas_encode.encode_lanes(
        jnp.asarray(coeffs), interpret=True)
    np.testing.assert_array_equal(np.asarray(sizes_p), np.asarray(sizes_f))
    assert np.asarray(ok_p).all() and np.asarray(ok_f).all()
    lp, lf = np.asarray(lanes_p), np.asarray(lanes_f)
    sz = np.asarray(sizes_p)
    for i in range(coeffs.shape[0]):
        np.testing.assert_array_equal(lp[i, :sz[i]], lf[i, :sz[i]],
                                      err_msg=f"block {i}")


def test_oracle_decodes_packed_encoded(rng):
    coeffs = _blocks(rng, 128)
    lanes, sizes, ok = pallas_encode8.encode_lanes8(
        jnp.asarray(coeffs), interpret=True)
    assert np.asarray(ok).all()
    st = DCTPlaneStream.from_lanes(np.asarray(lanes),
                                   np.asarray(sizes).astype(np.uint8))
    dec = decode_blocks_py(st.chunk_sizes, st.content)
    np.testing.assert_array_equal(dec, coeffs)


def test_a_region_is_decoder_w0_layout(rng):
    """The A output must be byte-for-byte the packed decoder's W0 window
    (rows 8w + r), so decompress consumes it with zero index work."""
    coeffs = _blocks(rng, 64)
    words, A, sizes, ok = pallas_encode8.encode_words8(
        jnp.asarray(coeffs), interpret=True)
    w0 = pack8_rows(jnp.asarray(np.asarray(words)[:, :8]).T)
    np.testing.assert_array_equal(np.asarray(A)[:, :8], np.asarray(w0))


def test_small_branches_byte_identical(rng):
    """Tiles taking the [16]-height front and tail specializations must
    stay byte-identical to the XLA encoder."""
    c = (rng.integers(-4, 5, (128, 64))
         * (rng.random((128, 64)) < 0.1)).astype(np.int16)
    c[0] = 0
    lanes_p, sizes_p, ok_p = pallas_encode8.encode_lanes8(
        jnp.asarray(c), interpret=True)
    lanes_x, sizes_x, _ = edev.encode_lanes(jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(sizes_p), np.asarray(sizes_x))
    lp, lx = np.asarray(lanes_p), np.asarray(lanes_x)
    sz = np.asarray(sizes_p)
    for i in range(c.shape[0]):
        np.testing.assert_array_equal(lp[i, :sz[i]], lx[i, :sz[i]])


def test_cont8_tier_flags_oversize(rng):
    """cont=8 (64-byte) emission tier: small chunks encode ok=True with
    correct continuation words; chunks >64 B flip ok (caller retries)."""
    from myyuv_tpu.entropy.reference import ZIGZAG
    c = (rng.integers(-8, 9, (64, 64))
         * (rng.random((64, 64)) < 0.1)).astype(np.int16)
    c[5] = rng.integers(-1024, 1024, 64)  # dense block: far over 64 B
    from myyuv_tpu.kernels.pallas_dct8 import pack_rows8
    m = c.astype(np.int32)[:, np.asarray(ZIGZAG)]
    pairs = ((m[:, 0::2] & 0xFFFF) | (m[:, 1::2] << 16)).astype(np.int32)
    wc, A, sizes, ok = pallas_encode8.encode_words_packed(
        pack_rows8(jnp.asarray(pairs)), cont=8, interpret=True)
    sizes = np.asarray(sizes)[:64]
    ok = np.asarray(ok)[:64]
    assert not ok[5] and sizes[5] > 64
    small = sizes <= 64
    assert ok[small].all()
    # cross-check the small chunks' bytes against the XLA encoder
    lanes_x, sizes_x, _ = edev.encode_lanes(jnp.asarray(c))
    np.testing.assert_array_equal(sizes[small], np.asarray(sizes_x)[small])


def test_cont24_mid_tier_roundtrip(rng):
    """cont=24 (CONT_MID) kernel geometry in interpret mode: the
    non-power-of-two continuation trim and 192-row window region are
    exercised by chunks between 64 and 128 bytes, then decoded straight
    back by the split-window decoder (cw=32)."""
    from myyuv_tpu.entropy import pallas_decode8 as pd8
    from myyuv_tpu.entropy.reference import ZIGZAG
    from myyuv_tpu.kernels.pallas_dct8 import pack_rows8

    zz = np.asarray(ZIGZAG)
    c = rng.integers(-16, 17, (64, 64)).astype(np.int16)  # dense mid alphabet
    c[0] = 0
    c[1, :] = 0
    c[1, 0] = 5
    m = c.astype(np.int32)[:, zz]
    pairs = ((m[:, 0::2] & 0xFFFF) | (m[:, 1::2] << 16)).astype(np.int32)
    C, A, sizes, ok = pallas_encode8.encode_words_packed(
        pack_rows8(jnp.asarray(pairs)), cont=24, interpret=True)
    sizes = np.asarray(sizes)[:64]
    assert np.asarray(ok)[:64].all()
    assert (sizes > 64).any(), "content must exercise continuation rows"
    assert (sizes <= 4 * (8 + 24)).all()
    # byte sizes agree with the XLA encoder
    _, sizes_x, _ = edev.encode_lanes(jnp.asarray(c))
    np.testing.assert_array_equal(sizes, np.asarray(sizes_x))
    # (A, C) feed the cw=32 split-window decoder verbatim
    out, dok = pd8.decode_words8_packed_split(A, C, interpret=True, tile=32)
    assert np.asarray(dok)[:64].all()
    ntp = out.shape[1]
    mm = np.asarray(out)[:512].reshape(64, 8, ntp).transpose(2, 1, 0)
    mm = mm.reshape(ntp * 8, 64)[:64][:, np.argsort(zz)]
    np.testing.assert_array_equal(mm.astype(np.int16), c)
