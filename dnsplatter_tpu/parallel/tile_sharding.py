"""Tile-sharded multi-chip rendering (shard_map + explicit collectives).

The workload's two parallel axes (SURVEY.md section 2.3) are Gaussians and
image tiles. This module implements the explicit-collective design:

  * Gaussian parameters live sharded along the capacity axis — each chip
    projects + SH-evaluates ITS shard only (embarrassingly parallel).
  * The projected screen payload (~56 B/Gaussian: means2d, conic, depth,
    opacity, features) is `all_gather`ed over ICI — far cheaper than
    gathering raw parameters (SH coefficients dominate there).
  * Each chip owns a horizontal slab of image tile rows and rasterizes it
    with the standard tile rasterizer (Pallas on TPU) by shifting the
    gathered means2d into slab-local coordinates — the single-chip kernel
    is reused unchanged.
  * Backward: autodiff through shard_map turns the all_gather into a
    reduce(psum) of payload gradients back onto each Gaussian's owner —
    exactly the gradient all-reduce the plan calls for, overlapped by XLA
    with the backward tile sweep.

The slab height is the padded image height / n_devices (tile-row
granularity), so every chip compiles the same static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.camera import Camera
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize
from dnsplatter_tpu.ops.sh import eval_sh


def slab_config(cfg: RasterizeConfig, n_devices: int) -> Tuple[RasterizeConfig, int]:
    """Per-device slab rasterizer config + slab pixel height."""
    rows = cfg.tiles_y
    rows_per_dev = -(-rows // n_devices)
    slab_h = rows_per_dev * cfg.tile_size
    cap = max(cfg.pair_capacity // n_devices, 1 << 12)
    slab_cfg = cfg._replace(
        height=slab_h,
        # binning requires capacity % chunk == 0 (head-window merge)
        pair_capacity=-(-cap // cfg.chunk) * cfg.chunk,
    )
    return slab_cfg, slab_h


def tile_sharded_render(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    cfg: RasterizeConfig,
    mesh: Mesh,
    axis: str = "gauss",
    sh_degree: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable multi-chip render: returns (image (H,W,F), alpha).

    params/alive must be sharded along the capacity axis over `mesh`;
    the returned image is sharded by slab (device-local rows).
    """
    n_dev = mesh.shape[axis]
    slab_cfg, slab_h = slab_config(cfg, n_dev)
    viewmat = camera.viewmat()
    cam_pos = camera.position()
    c2w_rot = camera.c2w[:3, :3]

    def worker(p_shard: GaussianParams, alive_shard: jax.Array):
        opac = jax.nn.sigmoid(p_shard.opacities)
        # opacity-aware per-axis radii (same tightening as the
        # single-chip path) — untightened circular bboxes would inflate
        # the pair lists and overflow the divided slab capacity early
        proj = project_gaussians(
            p_shard.means, p_shard.quats, jnp.exp(p_shard.scales), viewmat,
            camera.fx, camera.fy, camera.cx, camera.cy,
            cfg.width, cfg.height, opacities=opac,
        )
        viewdirs = p_shard.means - cam_pos[None, :]
        colors = eval_sh(sh_degree, p_shard.sh_coeffs(), viewdirs)
        from dnsplatter_tpu.ops.normals import per_gaussian_normals

        n_world = per_gaussian_normals(
            p_shard.scales, p_shard.quats, p_shard.means, cam_pos
        )
        feats = jnp.concatenate(
            [colors, n_world @ c2w_rot, proj.depths[:, None]], axis=-1
        )
        validf = (proj.valid & (alive_shard > 0.5)).astype(jnp.float32)

        payload = jnp.concatenate(
            [proj.means2d, proj.conics, proj.depths[:, None],
             opac[:, None], proj.radii_xy, validf[:, None], feats],
            axis=-1,
        )
        payload_all = jax.lax.all_gather(payload, axis, tiled=True)  # (N, .)

        dev = jax.lax.axis_index(axis)
        y0 = (dev * slab_h).astype(jnp.float32)
        m2d = payload_all[:, 0:2] - jnp.stack(
            [jnp.zeros_like(y0), y0]
        )[None, :]
        conics = payload_all[:, 2:5]
        depths = payload_all[:, 5]
        opac_all = payload_all[:, 6]
        radii = payload_all[:, 7:9]  # per-axis (x, y) extents
        valid_all = payload_all[:, 9]
        feats_all = payload_all[:, 10:]

        img, alpha = rasterize(
            m2d, conics, depths, opac_all, feats_all, valid_all, slab_cfg,
            radii=radii,
        )
        return img[None], alpha[None]  # leading device axis

    img, alpha = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), params), P(axis)),
        out_specs=(P(axis), P(axis)),
        # the rasterizer's internal loop carries start from literals; the
        # varying-axis checker can't see they become device-varying.
        check_vma=False,
    )(params, alive)
    # (n_dev, slab_h, W, F) stacked slabs -> full image, cropped to H.
    f = img.shape[-1]
    full = img.reshape(n_dev * slab_h, cfg.width, f)[: cfg.height]
    alpha_full = alpha.reshape(n_dev * slab_h, cfg.width, 1)[: cfg.height]
    return full, alpha_full
