"""Dense two-region device interchange: converters and edge geometries.

The frame/batch device paths carry compressed data as (A [64, ceil8(N)]
first-32-byte words, C [cont*8, ceil8(N)] continuation words — both in
the decoder's window layout — plus sizes); these tests pin the
native/numpy converters and the dense round trip on streams with many
multi-row chunks (high quality) and non-multiple-of-8 block counts.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from myyuv_tpu import native
from myyuv_tpu.engine import batch as eb
from myyuv_tpu.engine import device_stream as ds


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_native_split_roundtrip(rng):
    sizes = rng.integers(5, 250, 400).astype(np.int32)
    content = rng.integers(0, 256, int(sizes.sum())).astype(np.uint8)
    aT, b = native.expand_split(content, sizes)
    assert aT.shape == (64, 50)
    out = native.repack_split(aT, b, sizes)
    assert np.array_equal(out, content)


def test_native_split_matches_fallback(rng):
    sizes = rng.integers(5, 250, 300).astype(np.int32)
    content = rng.integers(0, 256, int(sizes.sum())).astype(np.uint8)
    aT, b = native.expand_split(content, sizes)
    lib, failed = native._lib, native._load_failed
    native._lib, native._load_failed = None, True
    try:
        aT2, b2 = native.expand_split(content, sizes)
        out2 = native.repack_split(aT2, b2, sizes)
    finally:
        native._lib, native._load_failed = lib, failed
    assert np.array_equal(aT, aT2)
    assert np.array_equal(b, b2)
    assert np.array_equal(out2, content)


def _frame(rng, h, w):
    y = rng.integers(0, 256, (h, w), np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    return y, u, v


@pytest.mark.parametrize("quality", [50, 95])
def test_frame_split_roundtrip(rng, quality):
    """High quality -> most chunks exceed 32 B, exercising region B."""
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts = eb.plane_qtables([quality] * 3)
    cA, cC, sizes, total, ok = ds.compress_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *qts,
        cont=ds.CONT_ROOMY)
    assert bool(ok)
    ry, ru, rv, dok = ds.decompress_frame(
        cA, cC, sizes, *qts, h=h, w=w)
    assert bool(dok)
    # pixels must round-trip exactly through the entropy layer: compare
    # against the transform-only roundtrip
    from myyuv_tpu.kernels import scalar
    for plane, recon, pid in ((y, ry, 0), (u, ru, 1), (v, rv, 2)):
        qt = scalar.plane_qtable(pid, quality)
        want = scalar.blocks_to_plane(
            scalar.dequantize_idct_blocks(
                scalar.dct_quantize_blocks(
                    scalar.plane_to_blocks(plane), qt), qt),
            *plane.shape)
        assert np.array_equal(np.asarray(recon), want)


def test_frame_split_nondivisible_blocks(rng):
    """n % 8 != 0 (48x48: 36 + 2*9 = 54 blocks) pads with filler."""
    h, w = 48, 48
    y, u, v = _frame(rng, h, w)
    qts = eb.plane_qtables([50] * 3)
    cA, cC, sizes, total, ok = ds.compress_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *qts,
        cont=ds.CONT_ROOMY)
    assert bool(ok)
    ry, ru, rv, dok = ds.decompress_frame(
        cA, cC, sizes, *qts, h=h, w=w)
    assert bool(dok)
    from myyuv_tpu.kernels import scalar
    qt = scalar.plane_qtable(0, 50)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(y), qt), qt), h, w)
    assert np.array_equal(np.asarray(ry), want)


def test_mid_tier_roundtrip(rng):
    """The 128-byte (cont=24 / cw=32) middle tier round-trips exactly;
    it is the production tier for q ~85-100 content (golden 4K q100 max
    chunk = 118 B)."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    y = (base + rng.integers(0, 16, (h, w), np.uint8)).astype(np.uint8)
    u = y[:h // 2, :w // 2]
    v = y[h // 2:, :w // 2]
    qts = eb.plane_qtables([90] * 3)
    cA, cC, sizes, total, ok = ds.compress_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *qts,
        cont=ds.CONT_MID)
    assert bool(ok), "mid tier must cover q90 smooth content"
    assert cC.shape[0] == ds.CONT_MID * 8
    ry, ru, rv, dok = ds.decompress_frame(cA, cC, sizes, *qts, h=h, w=w)
    assert bool(dok)
    from myyuv_tpu.kernels import scalar
    qt = scalar.plane_qtable(0, 90)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(y), qt), qt), h, w)
    assert np.array_equal(np.asarray(ry), want)


def test_roundtrip_frame_fused(rng):
    """The single-executable transcode roundtrip equals the two-call
    path's reconstruction."""
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts = eb.plane_qtables([50] * 3)
    ry, ru, rv, total, ok = ds.roundtrip_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *qts,
        cont=ds.CONT_ROOMY)
    assert bool(ok)
    from myyuv_tpu.kernels import scalar
    qt = scalar.plane_qtable(0, 50)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(y), qt), qt), h, w)
    assert np.array_equal(np.asarray(ry), want)


def test_capacity_overflow_flags_ok_false(rng):
    """The default 64-byte emission tier overflows on a high-entropy
    frame (chunks >64 B flip ok; callers retry with CONT_ROOMY)."""
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts = eb.plane_qtables([100] * 3)
    cA, cC, sizes, total, ok = ds.compress_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *qts,
        cont=ds.CONT_DEFAULT)
    assert not bool(ok)


def test_ladder_retries_to_roomy_tier(rng):
    """q=100 noise exceeds the default AND mid tiers; the host stream
    API must walk the ladder to CONT_ROOMY and still produce streams
    byte-identical to the host coder."""
    from myyuv_tpu import entropy
    from myyuv_tpu.kernels import scalar
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts_np = [np.asarray(q) for q in eb.plane_qtables([100] * 3)]
    streams = ds.compress_frame_to_streams((y, u, v), qts_np)
    assert int(streams[0][0].astype(np.int64).max()) > 4 * (8 + ds.CONT_MID)
    for plane, (sizes, content), pid in ((y, streams[0], 0),
                                         (u, streams[1], 1),
                                         (v, streams[2], 2)):
        co = scalar.dct_quantize_blocks(
            scalar.plane_to_blocks(plane), scalar.plane_qtable(pid, 100))
        wsizes, wcontent = entropy.encode_blocks(
            co.reshape(-1, 64).astype(np.int16))
        np.testing.assert_array_equal(sizes.astype(np.int64), wsizes)
        np.testing.assert_array_equal(content, wcontent)


def test_stream_decode_picks_mid_tier(rng):
    """Streams whose max chunk lands in (64, 128] B decode through the
    cont=24 window geometry (decompress_streams_to_frame tier pick)."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    y = (base + rng.integers(0, 88, (h, w), np.uint8)).astype(np.uint8)
    u = y[:h // 2, :w // 2]
    v = y[h // 2:, :w // 2]
    qts_np = [np.asarray(q) for q in eb.plane_qtables([90] * 3)]
    streams = ds.compress_frame_to_streams((y, u, v), qts_np)
    maxsz = max(int(s.astype(np.int64).max()) for s, _ in streams)
    assert 64 < maxsz <= 128, maxsz   # the tier this test exists to hit
    ry, ru, rv = ds.decompress_streams_to_frame(streams, qts_np, h, w)
    from myyuv_tpu.kernels import scalar
    qt = scalar.plane_qtable(0, 90)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(y), qt), qt), h, w)
    np.testing.assert_array_equal(ry, want)


def test_corrupt_stream_raises(rng):
    """A corrupted chunk must flip the decoder's validity flag and
    surface as BitstreamError from the host decompress API, never as
    silent wrong pixels."""
    from myyuv_tpu.runtime.errors import BitstreamError
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts_np = [np.asarray(q) for q in eb.plane_qtables([50] * 3)]
    streams = ds.compress_frame_to_streams((y, u, v), qts_np)
    sizes0, content0 = streams[0]
    bad = content0.copy()
    # stomp a chunk's tree section: an impossible code-length group
    bad[1:4] = 0xFF
    with pytest.raises(BitstreamError):
        ds.decompress_streams_to_frame(
            [(sizes0, bad)] + list(streams[1:]), qts_np, h, w)


def test_streams_match_host_encoder(rng):
    """File-layout streams from the device path equal the host coder's."""
    from myyuv_tpu import entropy
    from myyuv_tpu.kernels import scalar
    h, w = 64, 64
    y, u, v = _frame(rng, h, w)
    qts_np = [np.asarray(q) for q in eb.plane_qtables([90] * 3)]
    streams = ds.compress_frame_to_streams((y, u, v), qts_np)
    for plane, (sizes, content), pid in ((y, streams[0], 0),
                                         (u, streams[1], 1),
                                         (v, streams[2], 2)):
        co = scalar.dct_quantize_blocks(
            scalar.plane_to_blocks(plane),
            scalar.plane_qtable(pid, 90)).reshape(-1, 64)
        wsizes, wcontent = entropy.encode_blocks(co.astype(np.int16))
        assert np.array_equal(sizes.astype(np.int64), wsizes)
        assert np.array_equal(content, wcontent)
    # and back through the device decode path
    ry, ru, rv = ds.decompress_streams_to_frame(streams, qts_np, h, w)
    qt = scalar.plane_qtable(0, 90)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(y), qt), qt), h, w)
    assert np.array_equal(ry, want)
