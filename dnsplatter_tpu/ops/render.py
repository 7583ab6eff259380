"""Full differentiable render: projection + SH + single-pass rasterize.

The reference needs TWO rasterizer launches per step — gsplat
`rasterization(render_mode="RGB+ED")` for rgb+expected-depth and a legacy
`rasterize_gaussians` for per-Gaussian normals (dn_model.py:495-516,
564-575; README notes the second pass costs ~20%). gsplat's API forced
that; here the rasterizer composites arbitrary feature channels, so rgb,
normals, and depth render in ONE pass — the 20% penalty disappears.

Outputs match the reference's `get_outputs` dict (dn_model.py:605-612):
rgb, depth (expected/ED), normal (camera frame), surface_normal
(depth-gradient), accumulation, background.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.camera import Camera
from dnsplatter_tpu.ops.normals import (
    per_gaussian_normals,
    surface_normal_output,
    world_to_camera_normals,
)
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize
from dnsplatter_tpu.ops.sh import eval_sh


class RenderOutputs(NamedTuple):
    rgb: jax.Array  # (H, W, 3) background-composited
    depth: jax.Array  # (H, W, 1) expected depth (alpha-normalized)
    normal: jax.Array  # (H, W, 3) composited camera-frame normals
    surface_normal: jax.Array  # (H, W, 3) depth-gradient normals in [0,1]
    accumulation: jax.Array  # (H, W, 1) alpha
    background: jax.Array  # (3,)


class RenderInfo(NamedTuple):
    """Densification statistics (gsplat `info` dict equivalent)."""

    radii: jax.Array  # (N,) screen radii (0 = culled)
    depths: jax.Array  # (N,) camera z
    valid: jax.Array  # (N,) bool visibility
    means2d: jax.Array  # (N, 2) screen centers


def render(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    raster_cfg: RasterizeConfig,
    sh_degree_to_use: int = 3,
    background: Optional[jax.Array] = None,
    rasterize_mode: str = "classic",
    xys_sink: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    crop_box: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[RenderOutputs, RenderInfo]:
    """Render one camera. All shapes static; jit/vmap/pjit friendly.

    Args:
        alive: (C,) {0,1} mask of live Gaussians (capacity padding).
        sh_degree_to_use: active SH degree (reference schedule
            dn_model.py:487-493) — static int (recompile per bump, 4 total).
        xys_sink / absgrad_sink: optional (C, 2) zeros whose gradients
            expose screen-space mean gradients / absolute gradients for the
            densification statistics (dn_model.py:517-519, absgrad=True).
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    viewmat = camera.viewmat()
    opac_raw = jax.nn.sigmoid(params.opacities)
    proj = project_gaussians(
        params.means,
        params.quats,
        jnp.exp(params.scales),
        viewmat,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        camera.width,
        camera.height,
        near_plane=near_plane,
        far_plane=far_plane,
        # Lossless opacity-aware radius: fewer tile pairs for dim
        # Gaussians, identical render (see project_gaussians docstring).
        # Antialiased compensation only shrinks opacity, so the plain
        # sigmoid bound remains valid there too.
        opacities=opac_raw,
    )
    valid = proj.valid & (alive > 0.5)
    if crop_box is not None:
        # Eval-time crop (dn_model.py:440-464): only Gaussians inside the
        # world-space AABB render.
        lo, hi = crop_box
        inside = jnp.all(
            (params.means >= lo[None]) & (params.means <= hi[None]), axis=-1
        )
        valid = valid & inside

    opac = opac_raw
    if rasterize_mode == "antialiased":
        opac = opac * proj.compensations

    cam_pos = camera.position()
    viewdirs = params.means - cam_pos[None, :]
    colors = eval_sh(sh_degree_to_use, params.sh_coeffs(), viewdirs)

    # Per-Gaussian world normals (flattest axis, camera-facing), rotated
    # into the camera frame exactly like dn_model.py:542-560.
    n_world = per_gaussian_normals(params.scales, params.quats, params.means, cam_pos)
    n_cam = world_to_camera_normals(n_world, camera.c2w)

    feats = jnp.concatenate(
        [colors, n_cam, proj.depths[:, None]], axis=-1
    )  # (C, 7)

    means2d = proj.means2d
    if xys_sink is not None:
        means2d = means2d + xys_sink

    img, alpha = rasterize(
        means2d,
        proj.conics,
        proj.depths,
        opac,
        feats,
        valid,
        raster_cfg,
        absgrad_sink=absgrad_sink,
        radii=proj.radii_xy,
    )

    rgb_acc = img[..., 0:3]
    normal_acc = img[..., 3:6]
    depth_acc = img[..., 6:7]

    rgb = rgb_acc + (1.0 - alpha) * background[None, None, :]
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # Expected depth: accumulated/alpha where visible, detached max depth
    # elsewhere (splatfacto semantics, dn_model.py:526-539).
    max_depth = jax.lax.stop_gradient(jnp.max(depth_acc))
    depth = jnp.where(alpha > 0.0, depth_acc / jnp.maximum(alpha, 1e-10), max_depth)

    surface_normal = surface_normal_output(
        jax.lax.stop_gradient(depth), camera.fx, camera.fy, camera.cx, camera.cy
    )

    outputs = RenderOutputs(
        rgb=rgb,
        depth=depth,
        normal=normal_acc,
        surface_normal=surface_normal,
        accumulation=alpha,
        background=background,
    )
    info = RenderInfo(
        radii=proj.radii,
        depths=proj.depths,
        valid=valid,
        means2d=proj.means2d,
    )
    return outputs, info
