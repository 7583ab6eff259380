"""Mesh depth rendering (z-buffer) — pyrender/OpenGL replacement.

The reference renders gt/pred mesh depth from train poses with pyrender to
visibility-cull meshes before metric computation
(eval/eval_mesh_vis_cull.py:39-66, double-sided). Here triangles rasterize
on device: each face covers a bounded pixel window (eval meshes are
subdivided to max edge 0.015, so windows are tiny), barycentric-tested and
scatter-min'ed into the z-buffer. Chunked over faces; JAX/XLA throughout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.camera import Camera

WIN = 8  # per-face pixel window (subdivided eval meshes have tiny faces)


@functools.partial(jax.jit, static_argnames=("width", "height", "win"))
def _raster_chunk(v0, v1, v2, zbuf, fx, fy, cx, cy, width, height, win):
    """Rasterize one chunk of camera-space triangles into the z-buffer."""

    def proj(v):
        z = jnp.maximum(v[:, 2], 1e-6)
        return jnp.stack(
            [v[:, 0] * fx / z + cx, v[:, 1] * fy / z + cy], -1
        ), v[:, 2]

    p0, z0 = proj(v0)
    p1, z1 = proj(v1)
    p2, z2 = proj(v2)
    valid = (v0[:, 2] > 1e-6) & (v1[:, 2] > 1e-6) & (v2[:, 2] > 1e-6)

    lo = jnp.floor(jnp.minimum(jnp.minimum(p0, p1), p2)).astype(jnp.int32)
    # per-face pixel window
    oy = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
    pxi = lo[:, None, None, 0] + ox[None]
    pyi = lo[:, None, None, 1] + oy[None]
    px = pxi.astype(jnp.float32) + 0.5
    py = pyi.astype(jnp.float32) + 0.5

    def edge(a, b):
        # cross(b - a, p - a): positive for p left of a->b (ccw weight)
        return (b[:, None, None, 0] - a[:, None, None, 0]) * (
            py - a[:, None, None, 1]
        ) - (b[:, None, None, 1] - a[:, None, None, 1]) * (
            px - a[:, None, None, 0]
        )

    w0 = edge(p1, p2)
    w1 = edge(p2, p0)
    w2 = edge(p0, p1)
    # signed double area; dividing by it makes the inside test double-sided
    # (all barycentrics positive for interior points regardless of winding).
    area = (
        (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
        - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0])
    )[:, None, None]
    area_safe = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0 = w0 / area_safe
    b1 = w1 / area_safe
    b2 = w2 / area_safe
    # double-sided: inside if all barycentrics share the area's sign
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    zc = (
        b0 * z0[:, None, None] + b1 * z1[:, None, None]
        + b2 * z2[:, None, None]
    )
    on_img = (pxi >= 0) & (pxi < width) & (pyi >= 0) & (pyi < height)
    ok = inside & on_img & valid[:, None, None] & (zc > 1e-6)

    flat_idx = jnp.where(ok, pyi * width + pxi, width * height)
    zvals = jnp.where(ok, zc, jnp.inf)
    zbuf = zbuf.at[flat_idx.reshape(-1)].min(zvals.reshape(-1), mode="drop")
    return zbuf


def render_mesh_depth(
    vertices: np.ndarray,
    faces: np.ndarray,
    camera: Camera,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """(H, W) z-depth of the mesh from `camera` (inf where no surface)."""
    c2w_cv = np.asarray(camera.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
    w2c_r = c2w_cv[:3, :3].T
    v_cam = (vertices - c2w_cv[:3, 3]) @ w2c_r.T
    tri = v_cam[faces]  # (F, 3, 3)
    zbuf = jnp.full((camera.width * camera.height + 1,), jnp.inf)
    for s in range(0, len(tri), chunk):
        e = min(s + chunk, len(tri))
        zbuf = _raster_chunk(
            jnp.asarray(tri[s:e, 0]), jnp.asarray(tri[s:e, 1]),
            jnp.asarray(tri[s:e, 2]), zbuf,
            float(camera.fx), float(camera.fy), float(camera.cx),
            float(camera.cy), camera.width, camera.height, WIN,
        )
    out = np.asarray(zbuf[:-1]).reshape(camera.height, camera.width)
    return out
