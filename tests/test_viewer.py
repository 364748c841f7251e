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
