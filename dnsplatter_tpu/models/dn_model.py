"""DN-Splatter model: outputs + loss assembly (functional, jit-first).

Re-implements `DNSplatterModel` (reference dn_splatter/dn_model.py) as pure
functions over an explicit (params, alive) state:

  * `ModelConfig` — every flag of DNSplatterModelConfig + the splatfacto
    knobs it inherits (dn_model.py:55-123 and nerfstudio splatfacto).
  * `get_outputs` — render wrapper producing the reference's output dict
    {rgb, depth, normal, surface_normal, accumulation, background}
    (dn_model.py:404-612). Normals/depth/rgb composite in ONE rasterizer
    pass (the reference needs two, costing ~20%, README.md:60).
  * `compute_loss` — splatfacto main loss (L1 + SSIM) + scale_reg +
    regularization strategy (dn_model.py:614-729), with the gt clamp at
    10/255, mask application, sensor-vs-mono depth priority, and the
    mono-vs-depth normal supervision switch.

Flags that the reference declares but never wires into its loss
(use_depth_smooth_loss, use_sparse_loss — constructed at dn_model.py:174,
never applied in get_loss_dict) are implemented here as WORKING options,
default off, matching the reference defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.models import losses as L
from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.models.regularization import (
    RegularizationConfig,
    ags_regularization_loss,
    dn_regularization_loss,
)
from dnsplatter_tpu.ops.camera import Camera
from dnsplatter_tpu.ops.normals import normal_from_depth_image
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.ops.render import RenderInfo, render

# Viser's default background color, used by splatfacto when
# background_color == "random" at eval (dn_model.py:160-163).
VISER_BACKGROUND = (0.1490, 0.1647, 0.2157)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DNSplatterModelConfig parity (dn_model.py:55-123) + splatfacto base."""

    # --- DN-Splatter flags ---
    regularization_strategy: str = "dn-splatter"  # or "ags-mesh"
    use_depth_loss: bool = False
    depth_loss_type: str = "edge_aware_log_l1"
    depth_tolerance: float = 0.1
    smooth_loss_type: str = "tv"  # or "edge_aware_tv"
    depth_lambda: float = 0.0
    use_depth_smooth_loss: bool = False
    smooth_loss_lambda: float = 0.1
    predict_normals: bool = True
    use_normal_loss: bool = True
    use_normal_cosine_loss: bool = False
    use_normal_tv_loss: bool = True
    normal_supervision: str = "mono"  # or "depth"
    normal_lambda: float = 0.1
    use_sparse_loss: bool = False
    sparse_lambda: float = 0.1
    sparse_loss_steps: int = 10
    use_binary_opacities: bool = False
    binary_opacities_threshold: float = 0.9
    two_d_gaussians: bool = True

    # --- splatfacto base flags ---
    warmup_length: int = 500
    refine_every: int = 100
    resolution_schedule: int = 3000
    num_downscales: int = 0
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    continue_cull_post_densification: bool = True
    reset_alpha_every: int = 30
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    sh_degree_interval: int = 1000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    stop_split_at: int = 15000
    sh_degree: int = 3
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 5.0
    ssim_lambda: float = 0.2
    rasterize_mode: str = "classic"
    background_color: str = "random"
    num_random: int = 500_000
    random_scale: float = 10.0
    camera_optimizer_mode: str = "off"  # "off" | "SO3xR3" (dn_model.py:116)

    def regularization(self) -> RegularizationConfig:
        return RegularizationConfig(
            depth_tolerance=self.depth_tolerance,
            depth_loss_type=self.depth_loss_type,
            depth_lambda=self.depth_lambda,
            normal_lambda=self.normal_lambda,
            use_normal_loss=self.use_normal_loss,
            use_normal_tv_loss=self.use_normal_tv_loss,
            use_normal_cosine_loss=self.use_normal_cosine_loss,
        )


def sh_degree_to_use(step: int, cfg: ModelConfig) -> int:
    """SH degree schedule (dn_model.py:487-493). Static python int."""
    return min(int(step) // cfg.sh_degree_interval, cfg.sh_degree)


def get_outputs(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    cfg: ModelConfig,
    raster_cfg: RasterizeConfig,
    sh_degree: int = 3,
    background: Optional[jax.Array] = None,
    xys_sink: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    training: bool = True,
    rng: Optional[jax.Array] = None,
    crop_box=None,
) -> Tuple[Dict[str, jax.Array], RenderInfo]:
    """Reference `get_outputs` dict (dn_model.py:404-612)."""
    if background is None:
        if cfg.background_color == "random" and training and rng is not None:
            background = jax.random.uniform(rng, (3,))
        else:
            background = jnp.asarray(VISER_BACKGROUND, jnp.float32)

    out, info = render(
        params,
        alive,
        camera,
        raster_cfg,
        sh_degree_to_use=sh_degree,
        background=background,
        rasterize_mode=cfg.rasterize_mode,
        xys_sink=xys_sink,
        absgrad_sink=absgrad_sink,
        crop_box=crop_box,
    )
    # Reference normalizes the composited normal map to unit length and
    # maps to [0, 1] (dn_model.py:575-578). Use rsqrt(|n|^2 + eps): the
    # gradient of jnp.linalg.norm at exactly 0 (empty pixels) is NaN and
    # would poison whole tiles through 0 * NaN in the backward sums.
    n = out.normal
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    normal01 = (n + 1.0) * 0.5
    outputs = {
        "rgb": out.rgb,
        "depth": out.depth,
        "normal": normal01,
        "surface_normal": out.surface_normal,
        "accumulation": out.accumulation,
        "background": out.background,
    }
    return outputs, info


def compute_loss(
    outputs: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    cfg: ModelConfig,
    step: jax.Array,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss dict parity with dn_model.py:614-729 + splatfacto base loss.

    batch keys (all optional except image): image (H,W,3), sensor_depth
    (H,W,1), mono_depth (H,W,1), normal (H,W,3 in [0,1]), confidence
    (H,W,1 raw 0..255), mask (H,W,1).
    """
    # The 10/255 clamp (dn_model.py:633) feeds only the regularizers'
    # edge-aware weights; the reference's main photometric loss comes from
    # splatfacto's get_loss_dict on the UNCLAMPED image — clamping there
    # would bias every dark pixel toward gray.
    gt_img_raw = batch["image"]
    gt_img = jnp.clip(gt_img_raw, 10.0 / 255.0, None)
    pred_img = outputs["rgb"]
    depth_out = outputs["depth"]

    sensor_depth = batch.get("sensor_depth")
    mono_depth = batch.get("mono_depth")
    gt_normal = batch.get("normal")
    confidence = None
    if batch.get("confidence") is not None:
        confidence = 1.0 - batch["confidence"] / 255.0

    mask = batch.get("mask")
    pred_normal = outputs["normal"]
    if mask is not None:
        depth_out = depth_out * mask
        if sensor_depth is not None:
            sensor_depth = sensor_depth * mask
        if mono_depth is not None:
            mono_depth = mono_depth * mask
        if gt_normal is not None:
            gt_normal = gt_normal * mask
        pred_normal = pred_normal * mask

    # Splatfacto main photometric loss (unclamped gt).
    main_loss = L.rgb_main_loss(pred_img, gt_img_raw, cfg.ssim_lambda)

    # scale_reg: splatfacto applies the PhysGauss penalty every 10 steps
    # when enabled, else 0.
    if cfg.use_scale_regularization:
        scale_reg = jnp.where(
            step % 10 == 0,
            L.physgauss_scale_reg(params.scales, alive, cfg.max_gauss_ratio),
            0.0,
        )
    else:
        scale_reg = jnp.zeros((), jnp.float32)

    # Normal supervision target (dn_model.py:666-689).
    if cfg.normal_supervision == "depth":
        dn = normal_from_depth_image(
            jax.lax.stop_gradient(depth_out),
            camera.fx, camera.fy, camera.cx, camera.cy,
        )
        dn = dn * jnp.array([1.0, -1.0, -1.0])
        gt_normal_eff = (1.0 + dn) * 0.5
    else:
        gt_normal_eff = gt_normal

    # Depth target priority: sensor first, mono overrides if both
    # (dn_model.py:695-699).
    depth_gt = sensor_depth
    if mono_depth is not None:
        depth_gt = mono_depth

    reg_cfg = cfg.regularization()
    if cfg.regularization_strategy == "dn-splatter":
        reg_loss = dn_regularization_loss(
            reg_cfg,
            pred_depth=depth_out,
            gt_depth=depth_gt if cfg.use_depth_loss else None,
            pred_normal=pred_normal if cfg.use_normal_loss else None,
            gt_normal=gt_normal_eff,
            scales=params.scales,
            gt_img=gt_img,
            alive=alive,
            key=key,
        )
    elif cfg.regularization_strategy == "ags-mesh":
        surf = 2.0 * outputs["surface_normal"] - 1.0
        gtn = 2.0 * gt_normal_eff - 1.0 if gt_normal_eff is not None else None
        predn = 2.0 * pred_normal - 1.0
        reg_loss = ags_regularization_loss(
            reg_cfg,
            step=step,
            pred_depth=depth_out,
            gt_depth=depth_gt if cfg.use_depth_loss else None,
            confidence=confidence,
            surf_normal=surf,
            gt_normal=gtn,
            pred_normal=predn,
            scales=params.scales,
            gt_img=gt_img,
            alive=alive,
            key=key,
        )
    else:
        raise ValueError(cfg.regularization_strategy)

    total = main_loss + reg_loss

    # Working versions of the reference's dead flags (default off).
    if cfg.use_depth_smooth_loss:
        if cfg.smooth_loss_type == "edge_aware_tv":
            total = total + cfg.smooth_loss_lambda * L.edge_aware_tv_loss(
                depth_out, gt_img
            )
        else:
            total = total + cfg.smooth_loss_lambda * L.tv_loss(depth_out)
    if cfg.use_sparse_loss:
        sparse = L.sparse_opacity_loss(params.opacities, alive)
        total = total + jnp.where(
            step % cfg.sparse_loss_steps == 0, cfg.sparse_lambda * sparse, 0.0
        )

    total = total + scale_reg
    loss_dict = {
        "main_loss": main_loss + reg_loss,
        "scale_reg": scale_reg,
        "rgb_loss": main_loss,
        "reg_loss": reg_loss,
    }
    return total, loss_dict


def apply_binary_opacities(
    params: GaussianParams, alive: jax.Array, cfg: ModelConfig, step: jax.Array
) -> GaussianParams:
    """Binary-opacity clamp trick (dn_model.py:427-437): outside the
    opacity-reset margin, snap opacity params to 0/1 by threshold.

    DELIBERATE deviation from the reference (also noted in PARITY.md): the
    reference compares RAW logits against `binary_opacities_threshold`
    (default 0.9) and snaps logits to {0.0, 1.0} — i.e. post-sigmoid
    opacities of 0.5/0.73, which neither binarizes nor uses the threshold
    in probability space. Here the comparison happens on sigmoided
    opacities and the snap goes to logits ±15 (sigmoid ~0/~1), which is
    the documented intent of the flag ("set opacities to 0/1").
    """
    if not cfg.use_binary_opacities:
        return params
    skip = cfg.reset_alpha_every * cfg.refine_every
    in_margin = (step % skip) <= 200
    do = (step > cfg.warmup_length) & ~in_margin
    o = jax.nn.sigmoid(params.opacities)
    snapped = jnp.where(o >= cfg.binary_opacities_threshold, 15.0, -15.0)
    new_o = jnp.where(do & (alive > 0.5), snapped, params.opacities)
    return dataclasses.replace(params, opacities=new_o)
