"""Fused native CPU plane codec (DCT+quantize+Huffman in C++) vs oracles."""

import numpy as np
import pytest

from myyuv_tpu import native
from myyuv_tpu.kernels import scalar


@pytest.fixture(scope="module")
def nat():
    if not native.available():
        pytest.skip("native library unavailable")
    return native


@pytest.mark.parametrize("quality,plane_i", [(50, 0), (90, 1), (10, 2)])
def test_plane_roundtrip_bitexact(nat, rng, quality, plane_i):
    h, w = 64, 96
    plane = rng.integers(0, 256, (h, w), np.uint8)
    qt = scalar.plane_qtable(plane_i, quality)
    sizes, content = nat.compress_plane(plane, qt)
    want_coef = scalar.dct_quantize_blocks(scalar.plane_to_blocks(plane), qt)
    got_coef = nat.decode_blocks(sizes, content).reshape(-1, 8, 8)
    np.testing.assert_array_equal(got_coef, want_coef)
    rec = nat.decompress_plane(sizes, content, qt, h, w)
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(want_coef, qt), h, w)
    np.testing.assert_array_equal(rec, want)


def test_cpu_backend_pipeline_matches(images_dir):
    """entropy_backend='cpu' output equals the host/scalar-validated path."""
    from myyuv_tpu import YUVImage
    from myyuv_tpu.engine import pipeline
    if not native.available():
        pytest.skip("native library unavailable")
    img = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    c_cpu = pipeline.compress_dct(img, bytes([50, 60, 70]),
                                  entropy_backend="cpu")
    d_cpu = pipeline.decompress_dct(c_cpu, entropy_backend="cpu")
    # golden decode parity through the cpu backend
    golden = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    g_cpu = pipeline.decompress_dct(golden, entropy_backend="cpu")
    g_def = pipeline.decompress_dct(golden)
    np.testing.assert_array_equal(g_cpu.data, g_def.data)
    # roundtrip through the default (device-transform) decompressor
    d_def = pipeline.decompress_dct(c_cpu)
    np.testing.assert_array_equal(d_cpu.data, d_def.data)


def test_4k_golden_decompress_matches_oracle(images_dir, oracle_cli,
                                             tmp_path):
    """Full-size differential: the 4K golden decodes byte-identically."""
    import subprocess
    from myyuv_tpu import YUVImage
    from myyuv_tpu.engine import pipeline
    if not native.available():
        pytest.skip("native library unavailable")
    src = images_dir / "chef-with-trumpet-big-DCT-50.myyuv"
    ours = pipeline.decompress_dct(YUVImage.load(src),
                                   entropy_backend="cpu")
    ref_out = tmp_path / "ref4k.myyuv"
    subprocess.run([str(oracle_cli), str(src), "-decompress", "-o",
                    str(ref_out)], check=True, capture_output=True)
    assert ours.to_bytes() == ref_out.read_bytes()
