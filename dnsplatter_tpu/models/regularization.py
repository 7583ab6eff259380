"""Depth/normal regularization strategies: DN-Splatter and AGS-Mesh.

Parity targets (studied, re-implemented functionally for XLA):
  * DNRegularization — reference regularization_strategy.py:121-199.
    loss = depth + normal + scale. Depth masked by gt > depth_tolerance,
    EdgeAwareLogL1 default; the reference then does
    `depth_loss += depth_lambda * depth_loss` i.e. a (1 + lambda) scaling
    quirk (:184) — reproduced. Pearson path combines global pearson +
    lambda * local pearson. Normal: L1 + TV smoothness. Scale:
    mean(min exp(scale)) flattening.
  * AGSMeshRegularization — reference regularization_strategy.py:202-327.
    Staged: depth always (lambda * loss), gt zeroed by the confidence mask
    after step 7000; normal loss gated on after 7000, masked by dilated
    Laplacian edges of the gt normal before 15000, then by angular
    confidence < 0.1 rad; plus pred-normal L1 and scale loss.
  * find_edges / dilate_edge — regularization_strategy.py:29-96: Laplacian
    of 1/(im + 1e-6) thresholded at 0.01, dilated with a 3x3 cross.

All step gates use `jnp.where` on a traced step so a single compiled
train step serves the whole schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models import losses as L


def _conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """(H, W, C) image, (kh, kw) kernel, zero 'SAME' padding per channel."""
    x = jnp.transpose(img, (2, 0, 1))[:, None]  # (C,1,H,W)
    k = kernel[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return jnp.transpose(out[:, 0], (1, 2, 0))


# numpy on purpose: module-level jnp arrays would initialize the JAX
# backend at import time, which must not happen before
# jax.distributed.initialize on a multi-host launch (parallel/distributed).
_LAPLACIAN = np.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], np.float32
)
_CROSS = np.ones((3, 3), np.float32)


def find_edges(im: jax.Array, threshold: float = 0.01, dilation_itr: int = 1) -> jax.Array:
    """Dilated Laplacian edge mask of an (H, W, C) map.

    The Laplacian is applied to 1/(im + 1e-6) like the reference
    (regularization_strategy.py:40-96). Returns (H, W, C) bool.
    """
    lap = _conv2d_same(1.0 / (im + 1e-6), _LAPLACIAN)
    edges = (lap > threshold).astype(jnp.float32)
    for _ in range(dilation_itr):
        edges = _conv2d_same(edges, _CROSS)
    return edges > 0.0


def dilate_edge(edge: jax.Array, dilation_size: int = 1) -> jax.Array:
    """Binary dilation with a (2d+1)^2 ones kernel (reference :29-38)."""
    k = jnp.ones((2 * dilation_size + 1,) * 2, jnp.float32)
    return jnp.clip(_conv2d_same(edge, k), 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class RegularizationConfig:
    depth_tolerance: float = 0.1
    depth_loss_type: str = "edge_aware_log_l1"  # of losses.DepthLossType set
    depth_lambda: float = 0.2
    normal_lambda: float = 0.1
    normal_mask_steps: int = 15000  # AGS angular-confidence gate
    depth_mask_steps: int = 7000  # AGS confidence-filter gate
    use_normal_loss: bool = True
    use_normal_tv_loss: bool = True
    use_normal_cosine_loss: bool = False


def _depth_loss_core(
    cfg: RegularizationConfig,
    pred_depth: jax.Array,
    gt_depth: jax.Array,
    gt_img: jax.Array,
    mask: jax.Array,
    key: Optional[jax.Array],
) -> jax.Array:
    t = cfg.depth_loss_type
    if t == "edge_aware_log_l1":
        return L.edge_aware_log_l1_loss(pred_depth, gt_depth, gt_img, mask)
    if t == "mse":
        return L.mse_loss(pred_depth, gt_depth, mask)
    if t == "l1":
        return L.l1_loss(pred_depth, gt_depth, mask)
    if t == "log_l1":
        return L.log_l1_loss(pred_depth, gt_depth, mask)
    if t == "huber_l1":
        return L.huber_l1_loss(pred_depth, gt_depth, mask)
    if t == "pearson":
        # Reference combines global + depth_lambda*local (strategy.py:167-177).
        glob = L.pearson_depth_loss(pred_depth, gt_depth)
        loc = L.local_pearson_depth_loss(
            pred_depth, gt_depth, key if key is not None else jax.random.PRNGKey(0)
        )
        return glob + cfg.depth_lambda * loc
    raise ValueError(f"unknown depth loss {t}")


def dn_regularization_loss(
    cfg: RegularizationConfig,
    pred_depth: jax.Array,
    gt_depth: Optional[jax.Array],
    pred_normal: Optional[jax.Array],
    gt_normal: Optional[jax.Array],
    scales: jax.Array,
    gt_img: jax.Array,
    alive: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    use_depth: bool = True,
) -> jax.Array:
    """DN-Splatter strategy (regularization_strategy.py:121-199)."""
    loss = jnp.zeros((), jnp.float32)
    if use_depth and gt_depth is not None:
        valid = gt_depth > cfg.depth_tolerance
        dl = _depth_loss_core(cfg, pred_depth, gt_depth, gt_img, valid, key)
        dl = dl + cfg.depth_lambda * dl  # reference's (1+lambda) quirk, :184
        loss = loss + dl
    if cfg.use_normal_loss and pred_normal is not None and gt_normal is not None:
        nl = L.normal_l1_loss(pred_normal, gt_normal)
        if cfg.use_normal_tv_loss:
            nl = nl + L.normal_tv_loss(pred_normal)
        if cfg.use_normal_cosine_loss:
            nl = nl + L.normal_cosine_loss(
                2.0 * pred_normal - 1.0, 2.0 * gt_normal - 1.0
            )
        loss = loss + nl
    loss = loss + L.scale_flatten_loss(scales, alive)
    return loss


def ags_regularization_loss(
    cfg: RegularizationConfig,
    step: jax.Array,
    pred_depth: jax.Array,
    gt_depth: Optional[jax.Array],
    confidence: Optional[jax.Array],
    surf_normal: Optional[jax.Array],
    gt_normal: Optional[jax.Array],
    pred_normal: Optional[jax.Array],
    scales: jax.Array,
    gt_img: jax.Array,
    alive: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """AGS-Mesh strategy (regularization_strategy.py:202-327).

    Normal maps here are in [-1, 1] vector space, as the reference converts
    (2n - 1) before calling (dn_model.py:716-720).
    """
    loss = jnp.zeros((), jnp.float32)
    gate_depth = step >= cfg.depth_mask_steps

    if gt_depth is not None:
        if confidence is None:
            confidence = jnp.ones_like(gt_depth)
        gt_gated = jnp.where(confidence > 0, gt_depth, 0.0)
        gt_eff = jnp.where(gate_depth, gt_gated, gt_depth)
        mask = gt_eff > cfg.depth_tolerance
        dl = _depth_loss_core(cfg, pred_depth, gt_eff, gt_img, mask, key)
        loss = loss + cfg.depth_lambda * dl

    if surf_normal is not None and gt_normal is not None:
        lam = jnp.where(step > cfg.depth_mask_steps, cfg.normal_lambda, 0.0)
        # edge mask branch (< normal_mask_steps): exclude dilated edges
        edges = find_edges(gt_normal)
        not_edge = ~edges
        nl_edges = L.masked_mean(jnp.abs(surf_normal - gt_normal), not_edge)
        # angular-confidence branch (>= normal_mask_steps)
        ang = L.mean_angular_error_map(surf_normal, gt_normal)
        conf = (ang <= 0.1)[..., None]
        nl_conf = L.masked_mean(jnp.abs(surf_normal - gt_normal), conf)
        nl = jnp.where(step < cfg.normal_mask_steps, nl_edges, nl_conf) * lam
        if pred_normal is not None:
            nl = nl + L.l1_loss(pred_normal, gt_normal) * lam
        loss = loss + nl

    loss = loss + L.scale_flatten_loss(scales, alive)
    return loss
