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


def tile_sharded_outputs(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    model_cfg,
    cfg: RasterizeConfig,
    mesh: Mesh,
    axis: str = "gauss",
    sh_degree: int = 3,
    background: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    training: bool = True,
    rng: Optional[jax.Array] = None,
):
    """get_outputs (dn_model.py:404-612 parity) rendered tile-sharded.

    Same semantics as models.dn_model.get_outputs: each chip projects +
    SH-evaluates its Gaussian shard, all_gathers the screen payload,
    rasterizes its slab of tile rows (loss-bearing pixels live on their
    owner chip until the slabs are assembled), and the cheap image-space
    post-processing (background composite, expected-depth normalization,
    normal map, depth-gradient surface normal) runs on the assembled
    image. Under jax.grad the payload all_gather transposes to the
    Gaussian-gradient psum onto each shard's owner — the explicit
    collective the SURVEY §2.3 plan calls for.

    Returns (outputs dict, info) shaped exactly like get_outputs.
    """
    from dnsplatter_tpu.ops.normals import (
        per_gaussian_normals, surface_normal_output,
    )
    from dnsplatter_tpu.ops.render import RenderInfo

    if background is None:
        if (model_cfg.background_color == "random" and training
                and rng is not None):
            background = jax.random.uniform(rng, (3,))
        else:
            from dnsplatter_tpu.models.dn_model import VISER_BACKGROUND

            background = jnp.asarray(VISER_BACKGROUND, jnp.float32)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros_like(params.means[:, :2])

    n_dev = mesh.shape[axis]
    slab_cfg, slab_h = slab_config(cfg, n_dev)
    viewmat = camera.viewmat()
    cam_pos = camera.position()
    c2w_rot = camera.c2w[:3, :3]

    def worker(p_shard: GaussianParams, alive_shard, sink_shard):
        opac = jax.nn.sigmoid(p_shard.opacities)
        proj = project_gaussians(
            p_shard.means, p_shard.quats, jnp.exp(p_shard.scales), viewmat,
            camera.fx, camera.fy, camera.cx, camera.cy,
            cfg.width, cfg.height, opacities=opac,
        )
        if model_cfg.rasterize_mode == "antialiased":
            opac = opac * proj.compensations
        viewdirs = p_shard.means - cam_pos[None, :]
        colors = eval_sh(sh_degree, p_shard.sh_coeffs(), viewdirs)
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
        payload_all = jax.lax.all_gather(payload, axis, tiled=True)
        sink_all = jax.lax.all_gather(sink_shard, axis, tiled=True)

        dev = jax.lax.axis_index(axis)
        y0 = (dev * slab_h).astype(jnp.float32)
        m2d = payload_all[:, 0:2] - jnp.stack(
            [jnp.zeros_like(y0), y0]
        )[None, :]
        img, alpha = rasterize(
            m2d, payload_all[:, 2:5], payload_all[:, 5],
            payload_all[:, 6], payload_all[:, 10:], payload_all[:, 9],
            slab_cfg, absgrad_sink=sink_all, radii=payload_all[:, 7:9],
        )
        return (img[None], alpha[None], proj.radii,
                proj.valid & (alive_shard > 0.5))

    img, alpha, radii, valid = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), params), P(axis),
                  P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )(params, alive, absgrad_sink)
    f = img.shape[-1]
    img = img.reshape(n_dev * slab_h, cfg.width, f)[: cfg.height]
    alpha = alpha.reshape(n_dev * slab_h, cfg.width, 1)[: cfg.height]

    # Image-space post-processing (identical to ops/render.py:139-157 +
    # models/dn_model.py:151-165) on the assembled image.
    rgb = jnp.clip(img[..., 0:3] + (1.0 - alpha) * background[None, None, :],
                   0.0, 1.0)
    depth_acc = img[..., 6:7]
    max_depth = jax.lax.stop_gradient(jnp.max(depth_acc))
    depth = jnp.where(alpha > 0.0, depth_acc / jnp.maximum(alpha, 1e-10),
                      max_depth)
    surface_normal = surface_normal_output(
        jax.lax.stop_gradient(depth), camera.fx, camera.fy, camera.cx,
        camera.cy,
    )
    n = img[..., 3:6]
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    outputs = {
        "rgb": rgb,
        "depth": depth,
        "normal": (n + 1.0) * 0.5,
        "surface_normal": surface_normal,
        "accumulation": alpha,
        "background": background,
    }
    info = RenderInfo(radii=radii, depths=jnp.zeros_like(radii),
                      valid=valid, means2d=jnp.zeros((radii.shape[0], 2)))
    return outputs, info


def make_tile_train_step(
    model_cfg,
    optim_cfg,
    raster_cfg: RasterizeConfig,
    sh_degree: int,
    mesh: Mesh,
    axis: str = "gauss",
):
    """Full train step over the tile-sharded renderer (SURVEY §2.3: the
    Gaussian-sharding + image-tile-sharding combination): projection and
    the rasterize forward/backward run per-slab under shard_map, the loss
    runs on the assembled image, Gaussian gradients psum back to shard
    owners through the all_gather transpose, and one Adam update applies
    on the sharded state. Same call signature and semantics as
    trainer.make_train_step — tests assert it matches the single-device
    step."""
    from dnsplatter_tpu.models.dn_model import (
        apply_binary_opacities, compute_loss,
    )
    from dnsplatter_tpu.train.optim import adam_step
    from dnsplatter_tpu.train.strategy import update_stats

    max_size = float(max(raster_cfg.width, raster_cfg.height))

    @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
    def step_fn(params, alive, adam, stats, camera, batch, step, key,
                cam_state, cam_i):
        del cam_i  # camera optimizer not wired into the tile path
        kbg, kloss = jax.random.split(key)
        params_b = apply_binary_opacities(params, alive, model_cfg, step)
        sink = jnp.zeros_like(params_b.means[:, :2])

        def loss_fn(p, abs_sink):
            outputs, info = tile_sharded_outputs(
                p, alive, camera, model_cfg, raster_cfg, mesh, axis,
                sh_degree, absgrad_sink=abs_sink, training=True, rng=kbg,
            )
            loss, ld = compute_loss(
                outputs, batch, p, alive, camera, model_cfg, step, kloss
            )
            return loss, (ld, info)

        (loss, (loss_dict, info)), (gparams, gabs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params_b, sink)
        am = alive
        gparams = jax.tree.map(
            lambda g: g * am.reshape((-1,) + (1,) * (g.ndim - 1)), gparams
        )
        new_params, new_adam = adam_step(optim_cfg, params_b, gparams, adam,
                                         step)
        new_stats = update_stats(stats, gabs, info.radii, info.valid,
                                 max_size)
        return new_params, new_adam, new_stats, loss, loss_dict, cam_state

    return step_fn
