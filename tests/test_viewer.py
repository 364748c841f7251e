"""Viewer components: RGB export, terminal preview, cube renderer."""

import numpy as np
import pytest

pytest.importorskip("jax")

from myyuv_tpu.formats.bmp import BMPImage  # noqa: E402
from myyuv_tpu.viewer import cube, export, terminal  # noqa: E402


def test_bmp_export_roundtrip(tmp_path, rng):
    px = rng.integers(0, 256, (32, 48, 4), np.uint8)
    px[..., 3] = 255
    out = tmp_path / "x.bmp"
    export.write_bgrx_bmp(out, px)
    back = BMPImage.load(out)
    np.testing.assert_array_equal(back.pixels_topdown(), px)


def _write_bmp24(path, px3):
    """Write a minimal 24-bit bottom-up BMP (myyuv_sdl3/main.cpp:20-38
    displays these directly; our viewer-equivalents must accept them)."""
    from myyuv_tpu.formats.bmp import BMPColorHeader, BMPHeader
    h, w = px3.shape[:2]
    header = BMPHeader(width=w, height=h, bit_count=24, data_pos=54,
                       header_size=40, file_size=54 + w * h * 3)
    BMPImage(header, BMPColorHeader(),
             np.ascontiguousarray(px3[::-1]).reshape(-1)).dump(path)


def test_ensure_bgrx_widens_bgr24(rng):
    px3 = rng.integers(0, 256, (8, 12, 3), np.uint8)
    out = export.ensure_bgrx(px3)
    assert out.shape == (8, 12, 4)
    np.testing.assert_array_equal(out[..., :3], px3)
    assert (out[..., 3] == 0).all()
    px4 = rng.integers(0, 256, (8, 12, 4), np.uint8)
    assert export.ensure_bgrx(px4) is px4


def test_cli_rgb_preview_accept_bmp24(tmp_path, rng):
    from myyuv_tpu import cli
    px3 = rng.integers(0, 256, (16, 16, 3), np.uint8)
    src = tmp_path / "rgb24.bmp"
    _write_bmp24(src, px3)
    loaded = BMPImage.load(src)
    assert loaded.header.bit_count == 24
    np.testing.assert_array_equal(loaded.pixels_topdown(), px3)
    out = tmp_path / "widened.bmp"
    assert cli.main([str(src), "-rgb", "-o", str(out)]) == 0
    widened = BMPImage.load(out).pixels_topdown()
    np.testing.assert_array_equal(widened[..., :3], px3)
    txt = tmp_path / "preview.txt"
    assert cli.main([str(src), "-preview", "-o", str(txt)]) == 0
    assert "\x1b[38;2;" in txt.read_text()


def test_terminal_render(rng):
    px = rng.integers(0, 256, (16, 24, 4), np.uint8)
    s = terminal.render_ansi(px, max_cols=24)
    assert "\x1b[38;2;" in s and s.endswith("\x1b[0m")


def test_cube_frames(tmp_path, rng):
    tex = rng.integers(0, 256, (32, 48, 4), np.uint8)
    paths = cube.render_spinning_cube(tex, tmp_path / "cube",
                                      n_frames=2, out_size=64)
    assert len(paths) == 2
    frame = BMPImage.load(paths[0]).pixels_topdown()
    assert frame.shape == (64, 64, 4)
    cov = (frame[..., :3].sum(-1) > 0).mean()
    assert 0.05 < cov < 0.95  # cube visible, not full-screen
