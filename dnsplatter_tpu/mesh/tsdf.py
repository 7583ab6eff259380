"""TSDF fusion of rendered RGB-D frames (JAX, chunked voxel updates).

Replaces both native TSDF backends the reference calls out to —
vdbfusion's VDBVolume (`gs-mesh tsdf`, export_mesh.py:823-927) and
Open3D's ScalableTSDFVolume (`gs-mesh o3dtsdf`, export_mesh.py:930-1047):
a dense voxel grid updated frame-by-frame on device. Projective TSDF with
truncation, running weighted average, optional space carving, and color
integration. Voxels stream through the camera in chunks so the grid can
exceed VMEM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TSDFConfig:
    voxel_size: float = 0.01  # Open3DTSDFFusion default (export_mesh.py:939)
    sdf_trunc: float = 0.03
    space_carving: bool = False  # vdbfusion path default True for gs-mesh tsdf
    chunk: int = 1 << 18


class TSDFVolume(NamedTuple):
    origin: jax.Array  # (3,)
    dims: Tuple[int, int, int]
    voxel_size: float
    sdf_trunc: float
    tsdf: jax.Array  # (Nx*Ny*Nz,) in [-1, 1]
    weight: jax.Array
    color: jax.Array  # (Nx*Ny*Nz, 3)


def create_volume(bounds_min, bounds_max, cfg: TSDFConfig) -> TSDFVolume:
    bounds_min = np.asarray(bounds_min, np.float32)
    bounds_max = np.asarray(bounds_max, np.float32)
    dims = tuple(
        int(d) for d in np.ceil((bounds_max - bounds_min) / cfg.voxel_size) + 1
    )
    n = dims[0] * dims[1] * dims[2]
    return TSDFVolume(
        origin=jnp.asarray(bounds_min),
        dims=dims,
        voxel_size=cfg.voxel_size,
        sdf_trunc=cfg.sdf_trunc,
        tsdf=jnp.ones((n,), jnp.float32),
        weight=jnp.zeros((n,), jnp.float32),
        color=jnp.zeros((n, 3), jnp.float32),
    )


def voxel_centers(vol: TSDFVolume) -> jax.Array:
    nx, ny, nz = vol.dims
    ii = jnp.arange(nx * ny * nz)
    x = ii // (ny * nz)
    y = (ii // nz) % ny
    z = ii % nz
    grid = jnp.stack([x, y, z], -1).astype(jnp.float32)
    return vol.origin + grid * vol.voxel_size


@functools.partial(jax.jit, static_argnames=("space_carving",))
def _integrate_chunk(
    centers, tsdf, weight, color,
    depth, rgb, w2c_cv, fx, fy, cx, cy, sdf_trunc, space_carving,
):
    h, w = depth.shape[:2]
    pts_cam = centers @ w2c_cv[:3, :3].T + w2c_cv[:3, 3]
    z = pts_cam[:, 2]
    u = pts_cam[:, 0] * fx / jnp.maximum(z, 1e-8) + cx
    v = pts_cam[:, 1] * fy / jnp.maximum(z, 1e-8) + cy
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 1e-6)
    d = depth[vi, ui, 0]
    c = rgb[vi, ui]
    sdf = d - z
    valid_d = d > 1e-6
    near = sdf >= -sdf_trunc
    if space_carving:
        # also integrate free space far in front of the surface (drives
        # those voxels to +1), like vdbfusion's space-carving mode.
        update = in_img & valid_d & near
    else:
        # only the truncation band around the surface.
        update = in_img & valid_d & near & (sdf <= sdf_trunc)
    tsdf_obs = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
    w_new = jnp.where(update, 1.0, 0.0)
    w_tot = weight + w_new
    tsdf = jnp.where(
        update, (tsdf * weight + tsdf_obs * w_new) / jnp.maximum(w_tot, 1e-8),
        tsdf,
    )
    color = jnp.where(
        update[:, None],
        (color * weight[:, None] + c * w_new[:, None])
        / jnp.maximum(w_tot[:, None], 1e-8),
        color,
    )
    weight = jnp.where(update, w_tot, weight)
    return tsdf, weight, color


def integrate(
    vol: TSDFVolume,
    depth: np.ndarray,  # (H, W, 1) z-depth
    rgb: np.ndarray,  # (H, W, 3)
    c2w_gl: np.ndarray,  # (4, 4) OpenGL camera-to-world
    fx: float, fy: float, cx: float, cy: float,
    cfg: TSDFConfig = TSDFConfig(),
) -> TSDFVolume:
    """Fuse one frame into the volume."""
    c2w_cv = np.asarray(c2w_gl) @ np.diag([1.0, -1.0, -1.0, 1.0])
    w2c = np.linalg.inv(c2w_cv).astype(np.float32)
    centers = voxel_centers(vol)
    n = centers.shape[0]
    tsdf, weight, color = vol.tsdf, vol.weight, vol.color
    depth_j = jnp.asarray(depth, jnp.float32)
    rgb_j = jnp.asarray(rgb, jnp.float32)
    w2c_j = jnp.asarray(w2c)
    for s in range(0, n, cfg.chunk):
        e = min(s + cfg.chunk, n)
        t, w_, c = _integrate_chunk(
            centers[s:e], tsdf[s:e], weight[s:e], color[s:e],
            depth_j, rgb_j, w2c_j,
            float(fx), float(fy), float(cx), float(cy),
            vol.sdf_trunc, space_carving=cfg.space_carving,
        )
        tsdf = tsdf.at[s:e].set(t)
        weight = weight.at[s:e].set(w_)
        color = color.at[s:e].set(c)
    return vol._replace(tsdf=tsdf, weight=weight, color=color)


def extract_mesh(vol: TSDFVolume, min_weight: float = 1.0):
    """Marching-tetrahedra isosurface of the fused TSDF at level 0.

    Only fully observed cubes are meshed (Open3D ScalableTSDFVolume
    semantics) — unobserved voxels read +1, which would otherwise close a
    phantom shell at the back of every truncation band.

    Returns (vertices (V,3), faces (F,3), colors (V,3))."""
    from dnsplatter_tpu.mesh.marching import (
        filter_faces_to_observed, marching_tetrahedra,
    )

    nx, ny, nz = vol.dims
    field = np.asarray(vol.tsdf).reshape(nx, ny, nz)
    wgt = np.asarray(vol.weight).reshape(nx, ny, nz)
    observed = wgt >= min_weight
    # unobserved voxels -> +1 (outside); low-weight voxels neutralized
    field = np.where(observed, field, 1.0)
    verts, faces = marching_tetrahedra(field, level=0.0)
    verts, faces, _ = filter_faces_to_observed(verts, faces, observed)
    cols = None
    if len(verts):
        cvol = np.asarray(vol.color).reshape(nx, ny, nz, 3)
        vi = np.clip(np.round(verts).astype(int), 0,
                     [nx - 1, ny - 1, nz - 1])
        cols = cvol[vi[:, 0], vi[:, 1], vi[:, 2]]
        verts = np.asarray(vol.origin) + verts * vol.voxel_size
    return verts, faces, cols


def scene_bounds_from_cameras(cameras, depth_max: float = 5.0,
                              margin: float = 0.5):
    """Conservative AABB from camera positions + max depth reach."""
    pos = np.stack([np.asarray(c.position()) for c in cameras])
    lo = pos.min(0) - depth_max - margin
    hi = pos.max(0) + depth_max + margin
    return lo, hi
