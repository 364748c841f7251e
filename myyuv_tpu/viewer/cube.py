"""Spinning textured cube: the software-rendered analog of the reference's
OpenGL demo (myyuv_opengl/spinning_cube/).

A TPU pod has no display, so the demo renders frames with a pure-JAX
triangle rasterizer and writes them as BMPs: the decoded image is mapped
onto a spinning parallelepiped whose cross-section matches the image
aspect (create_parallelepiped, spinning_cube.cpp:157-225), viewed by a
perspective camera, with the same fragment-shader YUV->RGB math as the GL
path (kernels/device.iyuv_to_bgrx <-> frag_yuv.glsl).

Rasterization: all 12 triangles are tested against all pixels in parallel
(edge-function barycentrics + z-buffer select) — batched elementwise work
instead of the GPU's per-fragment pipeline, so it jits and batches over
frames like everything else in the engine.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def _cube_geometry(aspect: float):
    """Vertices + per-face UVs of a parallelepiped, x-extent scaled by the
    image aspect (spinning_cube.cpp:157-225 normalizes the textured faces
    to the image's width/height ratio)."""
    hx, hy, hz = 0.5 * aspect, 0.5, 0.5 * aspect
    # 8 corners
    v = np.array([[sx * hx, sy * hy, sz * hz]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                 np.float32)
    # 6 faces (quads as corner indices, counter-clockwise from outside)
    faces = [
        (0, 1, 3, 2),  # -x
        (5, 4, 6, 7),  # +x
        (4, 0, 2, 6),  # -z
        (1, 5, 7, 3),  # +z
        (2, 3, 7, 6),  # +y (top)
        (4, 5, 1, 0),  # -y (bottom)
    ]
    uv = np.array([(0, 1), (1, 1), (1, 0), (0, 0)], np.float32)
    tris, uvs = [], []
    for q in faces:
        tris += [(q[0], q[1], q[2]), (q[0], q[2], q[3])]
        uvs += [(uv[0], uv[1], uv[2]), (uv[0], uv[2], uv[3])]
    return (np.asarray(v), np.asarray(tris, np.int32),
            np.asarray(uvs, np.float32))


@functools.partial(jax.jit, static_argnames=("aspect", "out_h", "out_w"))
def render_frame(texture_bgrx: jnp.ndarray, angle: jnp.ndarray,
                 aspect: float, out_h: int = 512, out_w: int = 512
                 ) -> jnp.ndarray:
    """Render one frame -> [out_h, out_w, 4] uint8 BGRX."""
    verts_np, tris_np, uvs_np = _cube_geometry(float(aspect))
    verts = jnp.asarray(verts_np)
    tris = jnp.asarray(tris_np)
    uvs = jnp.asarray(uvs_np)

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    cb, sb = jnp.cos(angle * F32(0.7)), jnp.sin(angle * F32(0.7))
    rot_y = jnp.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], F32)
    rot_x = jnp.array([[1, 0, 0], [0, cb, -sb], [0, sb, cb]], F32)
    world = verts @ rot_y.T @ rot_x.T + jnp.array([0, 0, 2.5], F32)

    # perspective projection to pixel coordinates
    f = F32(1.8)
    sx = (world[:, 0] / world[:, 2]) * f
    sy = (world[:, 1] / world[:, 2]) * f
    px = (sx * F32(0.5) + F32(0.5)) * out_w
    py = (F32(0.5) - sy * F32(0.5)) * out_h
    inv_z = 1.0 / world[:, 2]

    # per-triangle screen-space vertices [12, 3]
    ax, ay = px[tris[:, 0]], py[tris[:, 0]]
    bx, by = px[tris[:, 1]], py[tris[:, 1]]
    cx, cy = px[tris[:, 2]], py[tris[:, 2]]
    za, zb, zc = inv_z[tris[:, 0]], inv_z[tris[:, 1]], inv_z[tris[:, 2]]
    uva, uvb, uvc = uvs[:, 0], uvs[:, 1], uvs[:, 2]

    ys = jnp.arange(out_h, dtype=F32)[:, None] + F32(0.5)
    xs = jnp.arange(out_w, dtype=F32)[None, :] + F32(0.5)

    def edge(x0, y0, x1, y1, x, y):
        return ((x1 - x0)[:, None, None] * (y - y0[:, None, None])
                - (y1 - y0)[:, None, None] * (x - x0[:, None, None]))

    # barycentric edge functions [12, H, W]
    w0 = edge(bx, by, cx, cy, xs, ys)
    w1 = edge(cx, cy, ax, ay, xs, ys)
    w2 = edge(ax, ay, bx, by, xs, ys)
    area = (w0 + w1 + w2)
    # back-face cull + inside test (counter-clockwise => area < 0 in this
    # y-down pixel space)
    inside = (w0 <= 0) & (w1 <= 0) & (w2 <= 0) & (area[..., :1, :1] < 0)
    l0, l1, l2 = w0 / area, w1 / area, w2 / area

    # perspective-correct interpolation of 1/z and uv/z
    izp = (l0 * za[:, None, None] + l1 * zb[:, None, None]
           + l2 * zc[:, None, None])
    def interp(attr_a, attr_b, attr_c):
        return (l0 * (attr_a * za)[:, None, None]
                + l1 * (attr_b * zb)[:, None, None]
                + l2 * (attr_c * zc)[:, None, None]) / izp

    u = interp(uva[:, 0], uvb[:, 0], uvc[:, 0])
    vv = interp(uva[:, 1], uvb[:, 1], uvc[:, 1])

    # z-buffer: pick the triangle with the largest 1/z among hits
    key = jnp.where(inside, izp, -jnp.inf)
    best = jnp.argmax(key, axis=0)                       # [H, W]
    hit = jnp.max(key, axis=0) > -jnp.inf
    uu = jnp.take_along_axis(u, best[None], axis=0)[0]
    vvv = jnp.take_along_axis(vv, best[None], axis=0)[0]

    th, tw = texture_bgrx.shape[:2]
    ti = jnp.clip((vvv * th).astype(jnp.int32), 0, th - 1)
    tj = jnp.clip((uu * tw).astype(jnp.int32), 0, tw - 1)
    texel = texture_bgrx[ti, tj]                          # [H, W, 4]
    bg = jnp.zeros((out_h, out_w, 4), jnp.uint8).at[..., 3].set(255)
    return jnp.where(hit[..., None], texel, bg)


def render_spinning_cube(texture_bgrx: np.ndarray, out_dir, n_frames: int = 24,
                         out_size: int = 512) -> list:
    """Render n_frames of the spinning textured cube to BMP files."""
    from . import export
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    h, w = texture_bgrx.shape[:2]
    aspect = w / h
    tex = jnp.asarray(texture_bgrx)
    paths = []
    for i in range(n_frames):
        angle = jnp.float32(2 * np.pi * i / n_frames)
        frame = np.asarray(render_frame(tex, angle, aspect,
                                        out_size, out_size))
        p = out_dir / f"frame_{i:03d}.bmp"
        export.write_bgrx_bmp(p, frame)
        paths.append(p)
    return paths
