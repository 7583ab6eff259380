"""Loss library (pure JAX, jit-friendly).

Re-implements every loss in the reference's dn_splatter/losses.py with
identical math but functional, mask-based formulations (no boolean fancy
indexing — XLA needs static shapes, so `x[mask].mean()` becomes a masked
mean). Parity notes cite the reference file:line.

Losses:
  depth:  mse, l1, log_l1, huber_l1, tv, edge_aware_log_l1, edge_aware_tv,
          pearson, local_pearson, adaptive (confidence-gated)
  rgb:    l1 + dssim (the splatfacto main loss), per-pixel dssim_l1
  normal: l1, tv smoothness, cosine, adaptive (angular-confidence gated)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def masked_mean(x: jax.Array, mask: Optional[jax.Array], eps: float = 1e-10) -> jax.Array:
    """Mean of x over elements where mask is true (broadcast over channels).

    Replaces the reference's `x[mask].mean()` with a static-shape
    formulation. With mask=None this is a plain mean.
    """
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def image_gradient_weights(rgb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """exp(-|grad rgb|) edge weights in x and y.

    Parity: losses.py:200-207 (EdgeAwareLogL1 lambda_x / lambda_y).
    rgb: (H, W, 3). Returns ((H, W-1, 1), (H-1, W, 1)).
    """
    grad_x = jnp.mean(jnp.abs(rgb[:, :-1, :] - rgb[:, 1:, :]), -1, keepdims=True)
    grad_y = jnp.mean(jnp.abs(rgb[:-1, :, :] - rgb[1:, :, :]), -1, keepdims=True)
    return jnp.exp(-grad_x), jnp.exp(-grad_y)


# ---------------------------------------------------------------------------
# depth losses
# ---------------------------------------------------------------------------


def mse_loss(pred, gt, mask=None):
    return masked_mean((pred - gt) ** 2, mask)


def l1_loss(pred, gt, mask=None):
    """Parity: losses.py:155-168."""
    return masked_mean(jnp.abs(pred - gt), mask)


def log_l1_loss(pred, gt, mask=None):
    """log(1 + |pred - gt|). Parity: losses.py:171-184."""
    return masked_mean(jnp.log1p(jnp.abs(pred - gt)), mask)


def edge_aware_log_l1_loss(pred, gt, rgb, mask=None):
    """Image-gradient-weighted LogL1 (the DN-Splatter default depth loss).

    Parity: losses.py:187-224 — per-pixel log-L1 weighted by exp(-|grad I|)
    separately along x and y, masked, each term mean-reduced.
    pred/gt: (H, W, 1), rgb: (H, W, 3), mask: (H, W, 1) bool or None.
    """
    logl1 = jnp.log1p(jnp.abs(pred - gt))
    lambda_x, lambda_y = image_gradient_weights(rgb)
    loss_x = lambda_x * logl1[:, :-1, :]
    loss_y = lambda_y * logl1[:-1, :, :]
    mask_x = mask[:, :-1, :] if mask is not None else None
    mask_y = mask[:-1, :, :] if mask is not None else None
    return masked_mean(loss_x, mask_x) + masked_mean(loss_y, mask_y)


def huber_l1_loss(pred, gt, mask=None, tresh: float = 0.2):
    """Huber with data-dependent knee d = tresh * max|err| over valid gt.

    Parity: losses.py:227-248 (mask there is gt != 0).
    """
    if mask is None:
        mask = gt != 0
    l1 = jnp.abs(pred - gt)
    d = tresh * jnp.max(jnp.where(jnp.broadcast_to(mask, l1.shape), l1, 0.0))
    loss = jnp.where(l1 < d, ((pred - gt) ** 2 + d * d) / (2.0 * d + 1e-12), l1)
    # The reference computes l1 on pred[mask]/gt[mask] and means over the
    # masked elements only (losses.py:241-246) — an unmasked mean would
    # dilute sparse sensor depth with |pred| at invalid pixels.
    return masked_mean(loss, mask)


def tv_loss(pred):
    """Total variation. Parity: losses.py:279-295. pred: (H, W, C)."""
    h_diff = pred[:, :-1, :] - pred[:, 1:, :]
    w_diff = pred[:-1, :, :] - pred[1:, :, :]
    return jnp.mean(jnp.abs(h_diff)) + jnp.mean(jnp.abs(w_diff))


def edge_aware_tv_loss(depth, rgb):
    """TV on depth, downweighted at image edges. Parity: losses.py:251-276."""
    grad_x = jnp.abs(depth[:, :-1, :] - depth[:, 1:, :])
    grad_y = jnp.abs(depth[:-1, :, :] - depth[1:, :, :])
    lambda_x, lambda_y = image_gradient_weights(rgb)
    return jnp.mean(grad_x * lambda_x) + jnp.mean(grad_y * lambda_y)


def pearson_depth_loss(pred, gt):
    """1 - Pearson correlation (scale/shift-invariant depth loss).

    Parity: losses.py:428-450.
    """
    src = pred - jnp.mean(pred)
    tgt = gt - jnp.mean(gt)
    src = src / (jnp.std(src) + 1e-6)
    tgt = tgt / (jnp.std(tgt) + 1e-6)
    return 1.0 - jnp.mean(src * tgt)


def local_pearson_depth_loss(pred, gt, key, box_p: int = 128, p_corr: float = 0.5):
    """Pearson loss over random square patches (SparseGS-style).

    Parity: losses.py:454-485 — n_corr = p_corr * floor(H/box) * floor(W/box)
    random boxes, averaged. Implemented with a vmapped dynamic-slice gather
    so the whole thing is one fused kernel instead of a Python loop.
    pred/gt: (H, W) or (H, W, 1).
    """
    if pred.ndim == 3:
        pred = pred[..., 0]
    if gt.ndim == 3:
        gt = gt[..., 0]
    h, w = pred.shape
    box_p = min(box_p, h, w)  # small images: shrink box instead of erroring
    n_corr = max(1, int(p_corr * (h // box_p) * (w // box_p)))
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_corr,), 0, max(1, h - box_p))
    y0 = jax.random.randint(ky, (n_corr,), 0, max(1, w - box_p))

    def one(x, y):
        p = jax.lax.dynamic_slice(pred, (x, y), (box_p, box_p))
        g = jax.lax.dynamic_slice(gt, (x, y), (box_p, box_p))
        return pearson_depth_loss(p, g)

    return jnp.mean(jax.vmap(one)(x0, y0))


def adaptive_depth_loss(pred, gt, rgb, mask, confidence, step, gate_step: int = 7000):
    """AGS-Mesh confidence-gated EdgeAwareLogL1.

    Before `gate_step`: plain edge-aware log-L1; after: gt is zeroed where
    the depth<->normal consistency mask rejects it, and the validity mask
    becomes gt > 0.1. Parity: losses.py:386-401. `step` may be traced
    (uses lax.cond-free where-select).
    """
    gated_gt = jnp.where(confidence > 0, gt, 0.0)
    gated_mask = gated_gt > 0.1
    use_gate = step >= gate_step
    gt_eff = jnp.where(use_gate, gated_gt, gt)
    mask_eff = jnp.where(use_gate, gated_mask, mask)
    return edge_aware_log_l1_loss(pred, gt_eff, rgb, mask_eff)


# ---------------------------------------------------------------------------
# rgb losses (splatfacto main loss)
# ---------------------------------------------------------------------------


def _gaussian_window(kernel_size: int, sigma: float) -> jax.Array:
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
) -> jax.Array:
    """Structural similarity, gaussian-windowed, matching torchmetrics'
    `StructuralSimilarityIndexMeasure(data_range=1.0, kernel_size=11)`
    defaults used at dn_model.py:180.

    img1, img2: (H, W, C) in [0, 1]. Returns scalar mean SSIM. The window
    is separable, so the whole computation is two thin depthwise convs —
    XLA fuses them onto the MXU.
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    win = _gaussian_window(kernel_size, sigma)

    x = jnp.transpose(img1, (2, 0, 1))[:, None]  # (C, 1, H, W)
    y = jnp.transpose(img2, (2, 0, 1))[:, None]

    def blur(t):
        t = jax.lax.conv_general_dilated(
            t, win[None, None, :, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jax.lax.conv_general_dilated(
            t, win[None, None, None, :], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    mu_x = blur(x)
    mu_y = blur(y)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # Clamp variances at 0: blur(x^2) - mu^2 can go slightly negative in
    # f32 (cancellation), which can flip the SSIM ratio above 1 and drive
    # the (1 - ssim) loss negative on near-converged images.
    sigma_x = jnp.maximum(blur(x * x) - mu_xx, 0.0)
    sigma_y = jnp.maximum(blur(y * y) - mu_yy, 0.0)
    sigma_xy = blur(x * y) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def rgb_main_loss(pred, gt, ssim_lambda: float = 0.2):
    """Splatfacto's main photometric loss:
    (1 - lambda) * L1 + lambda * (1 - SSIM). Parity: splatfacto
    get_loss_dict (consumed via dn_model.py:624-628)."""
    l1 = jnp.mean(jnp.abs(gt - pred))
    return (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - ssim(pred, gt))


def dssim_l1_per_pixel(pred, gt, kernel_size: int = 3, alpha: float = 0.85):
    """Per-pixel DSSIM+L1 (monodepth-style). Parity: losses.py:73-152.

    pred/gt: (H, W, C). Uses reflect padding + box windows like the
    reference's per-pixel branch. Returns (H, W, 1).
    """
    pad = (kernel_size - 1) // 2
    x = jnp.pad(pred, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    y = jnp.pad(gt, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def boxfilter(t):
        t = jnp.transpose(t, (2, 0, 1))[:, None]
        k = jnp.ones((1, 1, kernel_size, kernel_size)) / (kernel_size**2)
        out = jax.lax.conv_general_dilated(
            t, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        return jnp.transpose(out[:, 0], (1, 2, 0))

    c1, c2 = 0.01**2, 0.03**2
    mu_x = boxfilter(x)
    mu_y = boxfilter(y)
    sigma_x = jnp.maximum(boxfilter(x * x) - mu_x**2, 0.0)
    sigma_y = jnp.maximum(boxfilter(y * y) - mu_y**2, 0.0)
    sigma_xy = boxfilter(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    dssim = jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)
    dssim = jnp.mean(dssim, axis=-1, keepdims=True)
    l1 = jnp.mean(jnp.abs(pred - gt), axis=-1, keepdims=True)
    return alpha * dssim + (1.0 - alpha) * l1


# ---------------------------------------------------------------------------
# normal losses
# ---------------------------------------------------------------------------


def normal_l1_loss(pred, gt, mask=None):
    """L1 between normal maps (the reference reuses its generic L1)."""
    return masked_mean(jnp.abs(pred - gt), mask)


def normal_tv_loss(pred):
    """Smoothness prior on the predicted normal map (losses.py:279-295)."""
    return tv_loss(pred)


def normal_cosine_loss(pred, gt, mask=None):
    """1 - cos(pred, gt), means in [-1,1] vector space."""
    cos = jnp.sum(pred * gt, axis=-1, keepdims=True)
    return masked_mean(1.0 - cos, mask)


def mean_angular_error_map(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-pixel angular error (radians) between (H, W, 3) normal maps in
    [-1, 1]. Parity: regularization_strategy.py:11-26."""
    dots = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    return jnp.arccos(dots)


def adaptive_normal_loss(pred, gt, step, gate_step: int = 15000, thresh: float = 0.1):
    """AGS-Mesh adaptive normal loss: plain L1 before `gate_step`, then L1
    restricted to pixels whose angular error < thresh. Parity:
    losses.py:404-424 (inputs there in [0,1]; here in [-1,1])."""
    err = mean_angular_error_map(pred, gt)
    conf = (err <= thresh)[..., None]
    gated = masked_mean(jnp.abs(pred - gt), conf)
    plain = l1_loss(pred, gt)
    return jnp.where(step >= gate_step, gated, plain)


# ---------------------------------------------------------------------------
# gaussian-state regularizers
# ---------------------------------------------------------------------------


def scale_flatten_loss(scales_log, alive_mask=None):
    """mean(min_i exp(scale_i)) — drives Gaussians flat (2D-ish).

    Parity: regularization_strategy.py:195-199.
    """
    min_scale = jnp.min(jnp.exp(scales_log), axis=-1)
    return masked_mean(min_scale, alive_mask)


def physgauss_scale_reg(scales_log, alive_mask=None, max_gauss_ratio: float = 10.0):
    """Splatfacto's optional anisotropy penalty (use_scale_regularization):
    0.1 * mean(max(exp(smax - smin), ratio) - ratio)."""
    s = jnp.exp(scales_log)
    ratio = jnp.max(s, axis=-1) / jnp.maximum(jnp.min(s, axis=-1), 1e-12)
    pen = jnp.maximum(ratio, max_gauss_ratio) - max_gauss_ratio
    return 0.1 * masked_mean(pen, alive_mask)


def sparse_opacity_loss(opacities_logit, alive_mask=None):
    """Neural-Volumes sparsity prior pushing opacities to {0, 1}:
    mean(log(o) + log(1-o)) applied to sigmoided opacities.
    Parity target: dn_model.py config use_sparse_loss (dn_model.py:88-93).
    """
    o = jax.nn.sigmoid(opacities_logit)
    o = jnp.clip(o, 1e-6, 1.0 - 1e-6)
    return masked_mean(-(jnp.log(o) + jnp.log(1.0 - o)), alive_mask)
