"""Container-layer tests: byte-exact BMP and .myyuv I/O."""

import numpy as np
import pytest

from myyuv_tpu import BMPImage, Compressions, FourccFormats, YUVImage
from myyuv_tpu.formats import dct_stream
from myyuv_tpu.runtime.errors import FormatError


def test_bmp_golden_header(images_dir):
    bmp = BMPImage.load(images_dir / "chef-with-trumpet.bmp")
    assert bmp.true_width == 992
    assert bmp.true_height == 736
    assert bmp.header.bit_count == 32
    assert bmp.is_valid()
    assert bmp.image_size == 992 * 736 * 4


def test_bmp_roundtrip(tmp_path, images_dir):
    bmp = BMPImage.load(images_dir / "chef-with-trumpet.bmp")
    px = bmp.pixels_topdown()
    assert px.shape == (736, 992, 4)
    out = BMPImage.from_pixels(px)
    out.dump(tmp_path / "rt.bmp")
    rt = BMPImage.load(tmp_path / "rt.bmp")
    assert np.array_equal(rt.pixels_topdown(), px)


def test_yuv_golden_header(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    assert img.width == 992 and img.height == 736
    assert img.header.fourcc_format == FourccFormats.IYUV
    assert not img.is_compressed()
    assert img.header.data_size == 992 * 736 * 3 // 2
    assert img.is_valid()
    planes = img.planes()
    assert planes[0].shape == (736, 992)
    assert planes[1].shape == (368, 496)
    assert planes[2].shape == (368, 496)


def test_yuv_compressed_golden_header(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    assert img.is_compressed()
    assert img.header.compression == Compressions.DCT
    assert img.compression_params.tolist() == [50, 50, 50]
    assert img.header.data_size == 237421


def test_yuv_file_roundtrip(tmp_path, images_dir):
    raw = (images_dir / "chef-with-trumpet-DCT-50.myyuv").read_bytes()
    img = YUVImage.from_bytes(raw)
    img.dump(tmp_path / "rt.myyuv")
    assert (tmp_path / "rt.myyuv").read_bytes() == raw


def test_yuv_get_pixel(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet.myyuv")
    y, u, v = img.get_pixel(10, 20)
    planes = img.planes()
    assert y == planes[0][20, 10]
    assert u == planes[1][10, 5]
    assert v == planes[2][10, 5]
    with pytest.raises(FormatError):
        img.get_pixel(992, 0)


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.myyuv"
    p.write_bytes(b"XX" + b"\x00" * 100)
    with pytest.raises(FormatError):
        YUVImage.load(p)


def test_dct_stream_roundtrip(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    st = dct_stream.DCTStream.parse(img.data)
    assert all(p is not None for p in st.planes)
    assert st.planes[0].num_blocks == (992 // 8) * (736 // 8)
    assert st.planes[1].num_blocks == (496 // 8) * (368 // 8)
    assert np.array_equal(st.serialize(), img.data)


def test_dct_stream_lanes_roundtrip(images_dir):
    img = YUVImage.load(images_dir / "chef-with-trumpet-DCT-50.myyuv")
    st = dct_stream.DCTStream.parse(img.data)
    p = st.planes[0]
    lanes = p.to_lanes()
    assert lanes.shape == (p.num_blocks, dct_stream.MAX_CHUNK)
    rt = dct_stream.DCTPlaneStream.from_lanes(lanes, p.chunk_sizes)
    assert np.array_equal(rt.content, p.content)
    assert np.array_equal(rt.chunk_sizes, p.chunk_sizes)


def test_semi_planar_planes_and_sizes():
    """Group-generic plane geometry: a fake NV12-style SEMI_PLANAR format
    registered into the registry gets correct plane_offsets / planes /
    image_size (getYUVPlanes semantics, myyuv_yuv.cpp:383-427: chroma
    channels alias one interleaved region)."""
    from myyuv_tpu.formats import yuv as fy

    fcc = fy.fourcc("NV12")
    desc = fy.FormatDescriptor(
        fourcc=fcc, name="NV12", group=fy.FormatGroup.SEMI_PLANAR,
        plane_order=(0, 1, 2, fy.NO_PLANE), resolution_fraction=(2, 2))
    fy.register_format(desc, bmp_to_yuv=lambda bmp: None)
    try:
        w, h = 16, 8
        rng = np.random.default_rng(3)
        payload = rng.integers(0, 256, w * h * 3 // 2, dtype=np.int64)
        payload = payload.astype(np.uint8)
        hdr = fy.YUVHeader(fourcc_format=fcc, data_size=payload.size,
                           width=w, height=h, data_pos=fy.HEADER_SIZE)
        img = fy.YUVImage(hdr, None, payload)
        assert img.image_size() == w * h * 3 // 2
        assert img.plane_offsets() == (0, w * h, w * h, None)
        p = img.planes()
        assert p[0].shape == (h, w)
        assert np.array_equal(p[0], payload[:w * h].reshape(h, w))
        # both chroma entries alias the SAME interleaved UV region
        assert p[1].shape == (h // 2, w)
        assert np.array_equal(p[1], payload[w * h:].reshape(h // 2, w))
        assert np.shares_memory(p[1], p[2])
        assert p[3] is None
    finally:
        fy.FORMATS.pop(fcc, None)
        fy.BMP_TO_YUV.pop(fcc, None)


def test_packed_planes_alias_payload():
    """PACKED group: every present plane aliases the whole payload
    (res[o] = data, myyuv_yuv.cpp:404-406)."""
    from myyuv_tpu.formats import yuv as fy

    fcc = fy.fourcc("YUY2")
    desc = fy.FormatDescriptor(
        fourcc=fcc, name="YUY2", group=fy.FormatGroup.PACKED,
        plane_order=(0, 1, 2, fy.NO_PLANE), resolution_fraction=(2, 1))
    fy.register_format(desc, bmp_to_yuv=lambda bmp: None)
    try:
        w, h = 8, 4
        bits = desc.format_size_bits()
        assert bits == (8, 4, 4, 0)
        size = sum(w * h * b // 8 for b in bits)
        payload = np.arange(size, dtype=np.uint8)
        hdr = fy.YUVHeader(fourcc_format=fcc, data_size=size,
                           width=w, height=h, data_pos=fy.HEADER_SIZE)
        img = fy.YUVImage(hdr, None, payload)
        assert img.image_size() == size
        assert img.plane_offsets() == (0, 0, 0, None)
        p = img.planes()
        for o in range(3):
            assert np.shares_memory(p[o], payload)
    finally:
        fy.FORMATS.pop(fcc, None)
        fy.BMP_TO_YUV.pop(fcc, None)
