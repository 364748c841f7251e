"""Batched multi-frame device pipeline (CPU backend): stream layout and
roundtrip correctness vs the scalar oracle and the host entropy coder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import entropy  # noqa: E402
from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402


def _frames(rng, b, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
    y = ((base + rng.integers(0, 24, (b, h, w))) % 256).astype(np.uint8)
    u = rng.integers(100, 156, (b, h // 2, w // 2), np.uint8)
    v = rng.integers(100, 156, (b, h // 2, w // 2), np.uint8)
    return y, u, v


def test_batch_streams_match_host_encoder(rng):
    b, h, w = 3, 32, 48
    y, u, v = _frames(rng, b, h, w)
    qts = [np.asarray(scalar.plane_qtable(i, 50), np.float32)
           for i in range(3)]
    frames = ds.compress_batch_to_streams((y, u, v), qts)
    assert len(frames) == b
    for f in range(b):
        for i, plane in enumerate((y[f], u[f], v[f])):
            coeffs = scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(plane), qts[i])
            want_sizes, want_content = entropy.encode_blocks(
                coeffs.reshape(-1, 64).astype(np.int16))
            got_sizes, got_content = frames[f][i]
            np.testing.assert_array_equal(got_sizes, want_sizes)
            np.testing.assert_array_equal(got_content, want_content)


def test_batch_roundtrip_bit_exact(rng):
    b, h, w = 2, 32, 64
    y, u, v = _frames(rng, b, h, w)
    qts = tuple(jnp.asarray(np.asarray(scalar.plane_qtable(i, 50),
                                       np.float32)) for i in range(3))
    (ry, ru, rv), total, ok = ds.roundtrip_batch(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qts)
    assert bool(ok)
    for f in range(b):
        for plane, rec, qi in ((y[f], np.asarray(ry[f]), 0),
                               (u[f], np.asarray(ru[f]), 1),
                               (v[f], np.asarray(rv[f]), 2)):
            qt = np.asarray(scalar.plane_qtable(qi, 50), np.float32)
            want = scalar.blocks_to_plane(
                scalar.dequantize_idct_blocks(
                    scalar.dct_quantize_blocks(
                        scalar.plane_to_blocks(plane), qt), qt),
                *plane.shape)
            np.testing.assert_array_equal(rec, want)
    # compressed byte total matches the host encoder's
    want_total = 0
    for f in range(b):
        for i, plane in enumerate((y[f], u[f], v[f])):
            qt = np.asarray(scalar.plane_qtable(i, 50), np.float32)
            coeffs = scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(plane), qt)
            s, c = entropy.encode_blocks(coeffs.reshape(-1, 64))
            want_total += c.size
    assert int(total) == want_total
