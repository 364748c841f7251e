"""Differential tests of the host codec against the compiled reference CLI.

Strategy per SURVEY.md §4: (a) our decode of reference-compressed files is
byte-exact vs the reference CLI's decode; (b) the reference CLI decodes our
compressed files to the same pixels; (c) quantized coefficients are
bit-exact; (d) BMP->IYUV conversion matches the golden artifact.
"""

import numpy as np
import pytest

from conftest import oracle_run
from myyuv_tpu import BMPImage, Compressions, FourccFormats, YUVImage
from myyuv_tpu.entropy import reference as ent
from myyuv_tpu.formats import dct_stream
from myyuv_tpu.runtime.errors import GeometryError, MyYUVError


def decode_coeffs(img: YUVImage):
    """All-plane quantized coefficients from a compressed image."""
    st = dct_stream.DCTStream.parse(img.data)
    out = []
    for p in st.planes:
        pos = p.content_pos()
        content = p.content.tobytes()
        out.append(np.stack([
            ent.decode_block(content[pos[k]: pos[k] + p.chunk_sizes[k]])
            for k in range(p.num_blocks)]))
    return out


def test_convert_matches_golden(images_dir):
    bmp = BMPImage.load(images_dir / "chef-with-trumpet.bmp")
    img = YUVImage.from_bmp(bmp, FourccFormats.IYUV)
    golden = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    assert np.array_equal(img.data, golden.data)
    assert img.to_bytes() == (images_dir / "chef-with-trumpet.myyuv").read_bytes()


def test_decompress_matches_oracle(tmp_path, images_dir, oracle_cli):
    src = images_dir / "chef-with-trumpet-DCT-50.myyuv"
    oracle_out = tmp_path / "oracle_dec.myyuv"
    oracle_run(oracle_cli, src, "-decompress", "-o", oracle_out)
    ours = YUVImage.load(src).decompress()
    assert ours.to_bytes() == oracle_out.read_bytes()


def test_compress_interop_and_bitexact_coeffs(tmp_path, images_dir, oracle_cli):
    img = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    comp = img.compress(Compressions.DCT, bytes([50, 50, 50]))
    # (a) coefficients bit-exact vs the reference-compressed golden file
    golden = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    for a, b in zip(decode_coeffs(comp), decode_coeffs(golden)):
        assert np.array_equal(a, b)
    # (b) compression ratio matches or beats the reference
    assert comp.data.size <= golden.header.data_size
    # (c) the reference CLI decodes our file to its own roundtrip pixels
    ours_path = tmp_path / "ours_c50.myyuv"
    comp.dump(ours_path)
    dec_ours = tmp_path / "dec_ours.myyuv"
    dec_golden = tmp_path / "dec_golden.myyuv"
    oracle_run(oracle_cli, ours_path, "-decompress", "-o", dec_ours)
    oracle_run(oracle_cli, images_dir / "chef-with-trumpet-DCT-50.myyuv",
               "-decompress", "-o", dec_golden)
    assert dec_ours.read_bytes() == dec_golden.read_bytes()


@pytest.mark.parametrize("quality", [1, 10, 90, 100])
def test_synthetic_roundtrip_qualities(tmp_path, oracle_cli, rng, quality):
    """Random 64x32 image: our compress -> oracle decompress == our decompress."""
    w, h = 64, 32
    y = rng.integers(0, 256, (h, w), np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    img = YUVImage.from_planes(FourccFormats.IYUV, [y, u, v], w, h)
    comp = img.compress(Compressions.DCT, bytes([quality] * 3))
    ours = comp.decompress()
    p = tmp_path / "c.myyuv"
    comp.dump(p)
    oracle_run(oracle_cli, p, "-decompress", "-o", tmp_path / "d.myyuv")
    assert ours.to_bytes() == (tmp_path / "d.myyuv").read_bytes()


def test_reject_bad_geometry(rng):
    img = YUVImage.from_planes(
        FourccFormats.IYUV,
        [np.zeros((12, 12), np.uint8), np.zeros((6, 6), np.uint8),
         np.zeros((6, 6), np.uint8)], 12, 12)
    with pytest.raises(GeometryError):
        img.compress(Compressions.DCT, bytes([50, 50, 50]))


def test_reject_bad_quality():
    img = YUVImage.from_planes(
        FourccFormats.IYUV,
        [np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8),
         np.zeros((8, 8), np.uint8)], 16, 16)
    with pytest.raises(MyYUVError):
        img.compress(Compressions.DCT, bytes([0, 50, 50]))
    with pytest.raises(MyYUVError):
        img.compress(Compressions.DCT, bytes([50, 50]))


def test_double_compress_raises(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    with pytest.raises(MyYUVError):
        img.compress(Compressions.DCT, bytes([50, 50, 50]))


def test_decompress_uncompressed_is_identity(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    assert img.decompress() is img
