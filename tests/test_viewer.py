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


def _coverage(frame):
    """Fraction of pixels not equal to the clear color."""
    bg = np.array(cube.CLEAR_BGR + (255,), np.uint8)
    return (frame != bg).any(-1).mean()


def test_cube_frames(tmp_path, rng):
    tex = rng.integers(0, 256, (32, 48, 4), np.uint8)
    paths = cube.render_spinning_cube(tex, tmp_path / "cube",
                                      n_frames=2, out_size=64)
    assert len(paths) == 2
    frame = BMPImage.load(paths[0]).pixels_topdown()
    assert frame.shape == (64, 64, 4)
    assert 0.005 < _coverage(frame) < 0.95  # shape visible, not full-screen


def test_shape_placement_rejection_sampling(rng):
    """No two of N shapes within sqrt(3)*2 (spinning_cube.cpp:288-312);
    shape 0 at the origin; counts outside 1..1000 rejected."""
    pos = cube.generate_shape_positions(40, rng)
    assert pos.shape == (40, 3)
    np.testing.assert_array_equal(pos[0], np.zeros(3))
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    d[np.arange(40), np.arange(40)] = np.inf
    assert d.min() > np.sqrt(3.0) * 2.0
    r = cube.generation_radius(40)
    assert np.abs(pos).max() <= r + 1.0 + 1e-5  # generate_rand's [min,max+1)
    for bad in (0, 1001):
        with pytest.raises(ValueError):
            cube.generate_shape_positions(bad)


def test_shape_geometry_flags():
    """force_cube => +-1 cube; flip swaps the aspect; default matches
    normalize(w, h, w) (create_parallelepiped, spinning_cube.cpp:157-160)."""
    v, tris, uvs = cube.shape_geometry(64, 32)
    want = np.array([64, 32, 64], np.float64)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(np.abs(v).max(0), want, rtol=1e-6)
    vf, _, _ = cube.shape_geometry(64, 32, flip_width_height=True)
    wantf = np.array([32, 64, 32], np.float64)
    wantf = wantf / np.linalg.norm(wantf)
    np.testing.assert_allclose(np.abs(vf).max(0), wantf, rtol=1e-6)
    vc, _, _ = cube.shape_geometry(64, 32, force_cube=True)
    np.testing.assert_array_equal(np.abs(vc).max(0), [1, 1, 1])
    vcf, _, _ = cube.shape_geometry(64, 32, force_cube=True,
                                    flip_width_height=True)
    np.testing.assert_array_equal(vc, vcf)  # flip is a no-op for cubes
    assert tris.shape == (12, 3) and uvs.shape == (12, 3, 2)


def test_camera_matches_reference_semantics():
    """Camera state rules from spinning_cube.hpp:24-38 / .cpp:46-74."""
    cam = cube.Camera()
    assert cam.yaw == -90.0 and cam.speed == 3.0 and cam.sensitivity == 2.5
    np.testing.assert_allclose(cam.front, [0, 0, -1], atol=1e-6)
    # pitch clamps at +-89.9
    cam.turn(0, 1, 1000.0)
    assert cam.pitch == pytest.approx(89.9)
    # yaw wraps into (-180, 180]
    cam2 = cube.Camera(yaw=179.0)
    cam2.turn(1, 0, 1.0)  # +25 deg
    assert -180.0 < cam2.yaw <= 180.0
    # move steps along front at speed*delta
    cam3 = cube.Camera()
    cam3.move(1, 0, 0, 0.5)
    np.testing.assert_allclose(cam3.pos, [0, 0, -1.5], atol=1e-6)
    # view matrix maps the camera position to the origin
    v = cam3.view()
    p = v @ np.array([*cam3.pos, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0, atol=1e-5)


def test_multi_shape_fly_render(tmp_path, rng):
    tex = rng.integers(0, 256, (16, 16, 4), np.uint8)
    paths = cube.render_spinning_cube(
        tex, tmp_path / "field", n_frames=3, out_size=80, shapes=5,
        force_cube=True, fly_script=cube.default_fly_script, seed=3)
    f0 = BMPImage.load(paths[0]).pixels_topdown()
    f2 = BMPImage.load(paths[2]).pixels_topdown()
    assert _coverage(f0) > 0.001
    assert not np.array_equal(f0, f2)  # camera flew / shapes spun


def test_cli_cube_flags(tmp_path, rng):
    from myyuv_tpu import cli
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)
    src = tmp_path / "tex.bmp"
    _write_bmp24(src, px)
    out = tmp_path / "frames"
    assert cli.main([str(src), "-cube", "-frames", "2", "-size", "48",
                     "-shapes", "3", "-force_cube", "-fly",
                     "-o", str(out)]) == 0
    assert len(list(out.glob("frame_*.bmp"))) == 2
