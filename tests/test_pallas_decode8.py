"""Sublane-packed Pallas Huffman decoder vs the host encoders
(interpret mode, small tile so CPU interpret stays fast)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import native  # noqa: E402
from myyuv_tpu.entropy import encode_blocks_py, pallas_decode8  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTPlaneStream  # noqa: E402

TILE = 32     # 256 blocks per program in interpret mode


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
    dec, ok = pallas_decode8.decode_lanes8(jnp.asarray(lanes),
                                           interpret=True, tile=TILE)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), coeffs)


def test_corrupt_flagged(rng):
    coeffs = _blocks(rng, 64)
    sizes, content = encode_blocks_py(coeffs)
    lanes = DCTPlaneStream(sizes, content).to_lanes()
    # tree_size = 255: the parse can never consume 2040 tree bits (the
    # 64-symbol format bound caps it below ~800), so the section-size
    # check flags DETERMINISTICALLY for any content. (The previous
    # corruption — flipping the enc_bits low byte — is content-LUCKY:
    # the truncated payload can land exactly on a symbol boundary and
    # decode as a legitimately shorter stream; the host reference
    # decoder accepts those too, so they are not detectably corrupt.)
    lanes[5, 2] = 0xFF
    _, ok = pallas_decode8.decode_lanes8(jnp.asarray(lanes),
                                         interpret=True, tile=TILE)
    ok = np.asarray(ok)
    assert not ok[5]
    assert ok[6:].all()


def test_small_table_branch_decode(rng):
    """Small-alphabet tiles take the paired-table [8-group] branch."""
    from myyuv_tpu.entropy import device as edev
    c = (rng.integers(-4, 5, (256, 64))
         * (rng.random((256, 64)) < 0.15)).astype(np.int16)
    c[0] = 0
    lanes, sizes, ok = edev.encode_lanes(jnp.asarray(c))
    out, dok = pallas_decode8.decode_lanes8(jnp.asarray(lanes),
                                            interpret=True, tile=TILE)
    assert np.asarray(dok).all()
    np.testing.assert_array_equal(np.asarray(out), c)


def test_packed_decode_idct_chain(rng):
    """decode_words8_packed feeds dequantize_idct_packed with no relayout
    and reproduces the flat decode + scalar IDCT exactly (the TPU
    decompress route, engine/device_stream._decode_idct_packed)."""
    from myyuv_tpu.entropy.pallas_decode import _pack_words
    from myyuv_tpu.kernels import pallas_dct8, scalar

    n = 8 * TILE
    coeffs = _blocks(rng, n)
    np.clip(coeffs, -1023, 1023, out=coeffs)
    sizes, content = encode_blocks_py(coeffs)
    lanes = DCTPlaneStream(sizes, content).to_lanes()
    words, _ = _pack_words(jnp.asarray(lanes))
    wordsp = pallas_decode8.pack8_rows(words)
    outp, ok = pallas_decode8.decode_words8_packed(
        wordsp, interpret=True, tile=TILE)
    assert np.asarray(ok).all()
    qt = scalar.plane_qtable(0, 50)
    qtx = pallas_dct8.expand_qtables([jnp.asarray(qt)] * 3)
    pids = jnp.zeros((1, outp.shape[1]), jnp.int32)
    pixp = pallas_dct8.dequantize_idct_packed(outp, qtx, pids, tile=TILE,
                                              interpret=True)
    np8 = pixp.shape[1]
    got = np.asarray(pixp).reshape(64, 8, np8).transpose(2, 1, 0).reshape(
        np8 * 8, 64)[:n].astype(np.uint8)
    want = scalar.dequantize_idct_blocks(
        coeffs.reshape(n, 8, 8), qt).reshape(n, 64)
    np.testing.assert_array_equal(got, want)


def test_matches_unpacked_on_golden_stream():
    """Packed and unpacked kernels agree on a real golden-plane slice."""
    from pathlib import Path

    from myyuv_tpu import YUVImage, entropy
    from myyuv_tpu.formats.dct_stream import DCTStream
    p = Path("/root/reference/images/chef-with-trumpet-DCT-50.myyuv")
    if not p.exists():
        pytest.skip("golden image missing")
    st = DCTStream.parse(YUVImage.load(p).data)
    pl0 = st.planes[0]
    n = 512
    want = entropy.decode_blocks(pl0.chunk_sizes[:n],
                                 pl0.content[:pl0.chunk_sizes[:n]
                                             .astype(np.int64).sum()])
    lanes = DCTPlaneStream(pl0.chunk_sizes[:n],
                           pl0.content[:pl0.chunk_sizes[:n]
                                       .astype(np.int64).sum()]).to_lanes()
    dec, ok = pallas_decode8.decode_lanes8(jnp.asarray(lanes),
                                           interpret=True, tile=TILE)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), want)


def test_fused_matches_two_kernel(rng):
    """The one-kernel tree+payload+IDCT decompress variant reproduces
    decode_idct_words8_split exactly (interpret mode)."""
    from myyuv_tpu.entropy.pallas_decode import _pack_words
    from myyuv_tpu.kernels import pallas_dct8, scalar

    n = 8 * TILE
    coeffs = _blocks(rng, n)
    np.clip(coeffs, -1023, 1023, out=coeffs)
    sizes, content = encode_blocks_py(coeffs)
    lanes = DCTPlaneStream(sizes, content).to_lanes()
    words, _ = _pack_words(jnp.asarray(lanes))
    wordsp = pallas_decode8.pack8_rows(words)
    W0, Wc = wordsp[:64], wordsp[64:]
    qt = scalar.plane_qtable(0, 50)
    qtx = pallas_dct8.expand_qtables([jnp.asarray(qt)] * 3)
    pids = jnp.zeros((1, W0.shape[1]), jnp.int32)
    want_pix, want_ok = pallas_decode8.decode_idct_words8_split(
        W0, Wc, qtx, pids, interpret=True, tile=TILE)
    got_pix, got_ok = pallas_decode8.decode_idct_words8_split_fused(
        W0, Wc, qtx, pids, interpret=True, tile=TILE)
    np.testing.assert_array_equal(np.asarray(want_ok), np.asarray(got_ok))
    assert np.asarray(got_ok).all()
    np.testing.assert_array_equal(np.asarray(want_pix),
                                  np.asarray(got_pix))
    # anchor both against the scalar model (guards against a broken
    # grid validating itself — the tile_pi fallback bug)
    ntp = np.asarray(got_pix).shape[1]
    by = np.asarray(got_pix).reshape(16, 8, ntp).transpose(2, 1, 0) \
        .reshape(ntp * 8, 16).view(np.uint8).reshape(ntp * 8, 64)[:n]
    want = scalar.dequantize_idct_blocks(
        coeffs.reshape(n, 8, 8), qt).reshape(n, 64)
    # +-1 tolerance: the production word kernels carry no FMA-defeat
    # (exact on the TPU toolchain, sentinel-guarded) but CPU XLA
    # contracts the interpret-mode IDCT chains, shifting rint by 1 at
    # boundaries for some content; the EXACT fused==split equality
    # above is the invariant this test pins
    assert np.abs(by.astype(int) - want.astype(int)).max() <= 1
