"""Sharded END-TO-END compression on the virtual 8-device CPU mesh.

Round-1 sharding stopped at the dense transform; these tests put the
entropy encode + ragged compaction inside the shard_map graph and assert
the strongest property available: the sharded path produces the SAME
BYTES as the single-device path, and a full .myyuv file assembled from
the mesh is identical to the one the host codec writes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import entropy  # noqa: E402
from myyuv_tpu.engine import sharded_stream as ss  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402
from myyuv_tpu.parallel import mesh as meshlib  # noqa: E402


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshlib.make_mesh((4, 2))


def _plane(rng, h, w):
    # smooth-ish content so chunk sizes vary across blocks
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    noise = rng.integers(0, 24, (h, w), np.uint8)
    return (base + noise).astype(np.uint8)


def test_sharded_compress_bytes_identical(mesh, rng):
    plane = _plane(rng, 64, 128)
    qt = np.asarray(scalar.plane_qtable(0, 50), np.float32)
    sizes_sh, content_sh = ss.compress_plane_sharded(mesh, plane, qt)
    coeffs = scalar.dct_quantize_blocks(scalar.plane_to_blocks(plane), qt)
    sizes_ref, content_ref = entropy.encode_blocks(
        coeffs.reshape(-1, 64).astype(np.int16))
    np.testing.assert_array_equal(sizes_sh, sizes_ref)
    np.testing.assert_array_equal(content_sh, content_ref)


def test_sharded_compress_with_padding(mesh, rng):
    # 24x56 -> 21 blocks: not divisible by 8 devices, exercises padding
    plane = _plane(rng, 24, 56)
    qt = np.asarray(scalar.plane_qtable(1, 70), np.float32)
    sizes_sh, content_sh = ss.compress_plane_sharded(mesh, plane, qt)
    coeffs = scalar.dct_quantize_blocks(scalar.plane_to_blocks(plane), qt)
    sizes_ref, content_ref = entropy.encode_blocks(
        coeffs.reshape(-1, 64).astype(np.int16))
    np.testing.assert_array_equal(sizes_sh, sizes_ref)
    np.testing.assert_array_equal(content_sh, content_ref)


def test_sharded_roundtrip_matches_oracle(mesh, rng):
    h, w = 40, 72  # 45 blocks: padding on both directions
    plane = _plane(rng, h, w)
    qt = np.asarray(scalar.plane_qtable(0, 50), np.float32)
    sizes, content = ss.compress_plane_sharded(mesh, plane, qt)
    rec = ss.decompress_plane_sharded(mesh, sizes, content, qt, h, w)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(scalar.plane_to_blocks(plane), qt),
            qt), h, w)
    np.testing.assert_array_equal(rec, want)


def test_sharded_file_matches_host_file(mesh, tmp_path, rng):
    """A full .myyuv compressed via the mesh is byte-identical to the
    host-codec file (the strongest end-to-end sharding property)."""
    from myyuv_tpu import YUVImage
    from myyuv_tpu.engine import pipeline
    from myyuv_tpu.formats.yuv import FourccFormats

    h, w = 48, 64
    planes = [_plane(rng, h, w), _plane(rng, h // 2, w // 2),
              _plane(rng, h // 2, w // 2)]
    img = YUVImage.from_planes(FourccFormats.IYUV, planes, w, h)
    params = bytes([50, 50, 50])
    want = pipeline.compress_dct(img, params)

    qts = [np.asarray(scalar.plane_qtable(i, 50), np.float32)
           for i in range(3)]
    streams = [ss.compress_plane_sharded(mesh, planes[i], qts[i])
               for i in range(3)]
    got = pipeline.streams_to_compressed(img, params, streams)
    f1, f2 = tmp_path / "host.myyuv", tmp_path / "mesh.myyuv"
    want.dump(f1)
    got.dump(f2)
    assert f1.read_bytes() == f2.read_bytes()
