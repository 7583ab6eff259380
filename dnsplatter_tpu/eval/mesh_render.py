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


def _screen_extent(tri, fx, fy, cx, cy):
    """Conservative per-face screen bbox extent in pixels (np, camera
    space); faces touching/behind the near plane report 0 (the kernel's
    valid mask rejects them anyway)."""
    z = np.maximum(tri[..., 2], 1e-6)
    px = tri[..., 0] * fx / z + cx
    py = tri[..., 1] * fy / z + cy
    ext = np.maximum(px.max(1) - px.min(1), py.max(1) - py.min(1))
    behind = (tri[..., 2] <= 1e-6).any(1)
    return np.where(behind, 0.0, ext)


def render_mesh_depth(
    vertices: np.ndarray,
    faces: np.ndarray,
    camera: Camera,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """(H, W) z-depth of the mesh from `camera` (inf where no surface).

    Faces are bucketed by screen-space bbox extent and rasterized with a
    matching static pixel window (8 / 32 / 128); anything larger (raw
    un-subdivided meshes seen up close, e.g. the Faro scans in
    render_faro_depth) is midpoint-subdivided until it fits — a fixed
    tiny window would silently truncate big triangles to their corner
    and punch inf holes into the z-buffer, neutering the visibility
    cull's occlusion test."""
    c2w_cv = np.asarray(camera.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
    w2c_r = c2w_cv[:3, :3].T
    v_cam = (vertices - c2w_cv[:3, 3]) @ w2c_r.T
    tri = v_cam[faces].astype(np.float64)  # (F, 3, 3)
    fx, fy = float(camera.fx), float(camera.fy)
    cx, cy = float(camera.cx), float(camera.cy)

    max_ext = 126.0  # window covers [floor(min), floor(min)+win-1]
    for _ in range(12):  # halves extent per round; 12 covers any scene
        ext = _screen_extent(tri, fx, fy, cx, cy)
        big = ext > max_ext
        if not big.any():
            break
        t = tri[big]
        m01 = 0.5 * (t[:, 0] + t[:, 1])
        m12 = 0.5 * (t[:, 1] + t[:, 2])
        m20 = 0.5 * (t[:, 2] + t[:, 0])
        quarters = np.concatenate([
            np.stack([t[:, 0], m01, m20], 1),
            np.stack([m01, t[:, 1], m12], 1),
            np.stack([m20, m12, t[:, 2]], 1),
            np.stack([m01, m12, m20], 1),
        ])
        tri = np.concatenate([tri[~big], quarters])
    ext = _screen_extent(tri, fx, fy, cx, cy)

    zbuf = jnp.full((camera.width * camera.height + 1,), jnp.inf)
    buckets = {8: (-1.0, 6.0), 32: (6.0, 30.0), 128: (30.0, np.inf)}
    for win in (8, 32, 128):
        lo_b, hi_b = buckets[win]
        sel = tri[(ext > lo_b) & (ext <= hi_b)]
        if len(sel) == 0:
            continue
        win_chunk = max(256, chunk * 64 // (win * win))
        for s in range(0, len(sel), win_chunk):
            e = min(s + win_chunk, len(sel))
            zbuf = _raster_chunk(
                jnp.asarray(sel[s:e, 0], jnp.float32),
                jnp.asarray(sel[s:e, 1], jnp.float32),
                jnp.asarray(sel[s:e, 2], jnp.float32), zbuf,
                fx, fy, cx, cy, camera.width, camera.height, win,
            )
    out = np.asarray(zbuf[:-1]).reshape(camera.height, camera.width)
    return out


@functools.partial(jax.jit, static_argnames=("width", "height", "win", "c"))
def _attr_chunk(v0, v1, v2, a0, a1, a2, zbuf, abuf, fx, fy, cx, cy,
                width, height, win, c):
    """Resolve pass: write barycentric-interpolated vertex attributes for
    pixels whose z matches the first-pass z-buffer (within tolerance)."""

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
    oy = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
    pxi = lo[:, None, None, 0] + ox[None]
    pyi = lo[:, None, None, 1] + oy[None]
    px = pxi.astype(jnp.float32) + 0.5
    py = pyi.astype(jnp.float32) + 0.5

    def edge(a, b):
        return (b[:, None, None, 0] - a[:, None, None, 0]) * (
            py - a[:, None, None, 1]
        ) - (b[:, None, None, 1] - a[:, None, None, 1]) * (
            px - a[:, None, None, 0]
        )

    w0 = edge(p1, p2)
    w1 = edge(p2, p0)
    w2 = edge(p0, p1)
    area = (
        (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
        - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0])
    )[:, None, None]
    area_safe = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0 = w0 / area_safe
    b1 = w1 / area_safe
    b2 = w2 / area_safe
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    zc = (
        b0 * z0[:, None, None] + b1 * z1[:, None, None]
        + b2 * z2[:, None, None]
    )
    on_img = (pxi >= 0) & (pxi < width) & (pyi >= 0) & (pyi < height)
    flat = jnp.where(on_img, pyi * width + pxi, width * height)
    zwin = zbuf[flat]
    ok = (
        inside & on_img & valid[:, None, None] & (zc > 1e-6)
        & (zc <= zwin * (1.0 + 1e-4) + 1e-5)
    )
    attr = (
        b0[..., None] * a0[:, None, None, :]
        + b1[..., None] * a1[:, None, None, :]
        + b2[..., None] * a2[:, None, None, :]
    )  # (F, win, win, C)
    idx = jnp.where(ok, flat, width * height)
    abuf = abuf.at[idx.reshape(-1)].set(
        attr.reshape(-1, c), mode="drop"
    )
    return abuf


def render_mesh_attributes(
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_attrs: np.ndarray,
    camera: Camera,
    chunk: int = 1 << 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render per-vertex attributes (e.g. normals) with barycentric
    interpolation: returns (depth (H, W), attrs (H, W, C); zeros where no
    surface). The pyrender/pytorch3d role in the reference's gt normal
    renderers (data/mushroom_utils/render_faro_nm.py,
    data/replica_utils/render_normals.py): first a z-buffer pass, then a
    resolve pass keeps attributes whose depth matches the buffer."""
    zimg = render_mesh_depth(vertices, faces, camera, chunk)
    c2w_cv = np.asarray(camera.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
    w2c_r = c2w_cv[:3, :3].T
    v_cam = (vertices - c2w_cv[:3, 3]) @ w2c_r.T
    tri = v_cam[faces].astype(np.float64)
    attrs = np.asarray(vertex_attrs, np.float32)
    if attrs.ndim == 1:
        attrs = attrs[:, None]
    fattr = attrs[faces]  # (F, 3, C)
    fx, fy = float(camera.fx), float(camera.fy)
    cx, cy = float(camera.cx), float(camera.cy)

    # resolve pass shares the depth pass's bucketing idea but NOT its
    # subdivision (attribute interpolation is linear, so splitting is
    # only needed to bound the window): subdivide attrs alongside.
    max_ext = 126.0
    for _ in range(12):
        ext = _screen_extent(tri, fx, fy, cx, cy)
        big = ext > max_ext
        if not big.any():
            break
        t = tri[big]
        fa = fattr[big]
        m01, a01 = 0.5 * (t[:, 0] + t[:, 1]), 0.5 * (fa[:, 0] + fa[:, 1])
        m12, a12 = 0.5 * (t[:, 1] + t[:, 2]), 0.5 * (fa[:, 1] + fa[:, 2])
        m20, a20 = 0.5 * (t[:, 2] + t[:, 0]), 0.5 * (fa[:, 2] + fa[:, 0])
        tri = np.concatenate([
            tri[~big],
            np.stack([t[:, 0], m01, m20], 1),
            np.stack([m01, t[:, 1], m12], 1),
            np.stack([m20, m12, t[:, 2]], 1),
            np.stack([m01, m12, m20], 1),
        ])
        fattr = np.concatenate([
            fattr[~big],
            np.stack([fa[:, 0], a01, a20], 1),
            np.stack([a01, fa[:, 1], a12], 1),
            np.stack([a20, a12, fa[:, 2]], 1),
            np.stack([a01, a12, a20], 1),
        ])
    ext = _screen_extent(tri, fx, fy, cx, cy)

    cdim = fattr.shape[-1]
    zflat = jnp.concatenate(
        [jnp.asarray(zimg.reshape(-1), jnp.float32), jnp.full((1,), jnp.inf)]
    )
    abuf = jnp.zeros((camera.width * camera.height + 1, cdim), jnp.float32)
    buckets = {8: (-1.0, 6.0), 32: (6.0, 30.0), 128: (30.0, np.inf)}
    for win in (8, 32, 128):
        lo_b, hi_b = buckets[win]
        m = (ext > lo_b) & (ext <= hi_b)
        sel, sattr = tri[m], fattr[m]
        if len(sel) == 0:
            continue
        win_chunk = max(256, chunk * 64 // (win * win))
        for s0 in range(0, len(sel), win_chunk):
            e0 = min(s0 + win_chunk, len(sel))
            abuf = _attr_chunk(
                jnp.asarray(sel[s0:e0, 0], jnp.float32),
                jnp.asarray(sel[s0:e0, 1], jnp.float32),
                jnp.asarray(sel[s0:e0, 2], jnp.float32),
                jnp.asarray(sattr[s0:e0, 0]), jnp.asarray(sattr[s0:e0, 1]),
                jnp.asarray(sattr[s0:e0, 2]), zflat, abuf,
                fx, fy, cx, cy, camera.width, camera.height, win, cdim,
            )
    out = np.asarray(abuf[:-1]).reshape(camera.height, camera.width, cdim)
    return zimg, out


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (trimesh/Open3D
    compute_vertex_normals role), unit length."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    n = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(n, 1e-12)).astype(np.float32)
