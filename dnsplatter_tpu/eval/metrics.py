"""Metric suite (parity: dn_splatter/metrics.py).

  * RGBMetrics: PSNR, SSIM(kernel 11), LPIPS (metrics.py:77-108)
  * DepthMetrics: abs_rel, sq_rel, rmse, rmse_log, delta<1.25^{1,2,3},
    masked at gt > 0.1 (metrics.py:111-149)
  * NormalMetrics: MAE/RMSE in radians + mean/median (metrics.py:152-183)
  * PDMetrics: point-cloud accuracy (90th-percentile NN distance) and
    completeness (% of gt within 5 cm) via scipy cKDTree (metrics.py:11-56)

LPIPS needs pretrained VGG16 features; with no network egress the weights
must be supplied as an .npz (see `lpips_from_npz`). When absent, LPIPS
reports NaN rather than failing the whole eval.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models.losses import ssim as ssim_fn


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def rgb_metrics(pred: jax.Array, gt: jax.Array,
                lpips_fn=None) -> Dict[str, float]:
    """(H, W, 3) in [0,1]. Parity: metrics.py:77-108."""
    out = {
        "psnr": float(psnr(pred, gt)),
        "ssim": float(ssim_fn(pred, gt, kernel_size=11)),
        "mse": float(jnp.mean((pred - gt) ** 2)),
    }
    out["lpips"] = float(lpips_fn(pred, gt)) if lpips_fn else float("nan")
    return out


def depth_metrics(pred: jax.Array, gt: jax.Array,
                  mask_thresh: float = 0.1) -> Dict[str, float]:
    """(H, W, 1) depths; gt <= 0.1 masked out. Parity: metrics.py:111-149."""
    pred = pred.reshape(-1)
    gt = gt.reshape(-1)
    mask = gt > mask_thresh
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)

    def wmean(x):
        return jnp.sum(x * w) / n

    pred_c = jnp.where(mask, pred, 1.0)
    gt_c = jnp.where(mask, gt, 1.0)
    thresh = jnp.maximum(pred_c / gt_c, gt_c / pred_c)
    abs_rel = wmean(jnp.abs(pred_c - gt_c) / gt_c)
    sq_rel = wmean((pred_c - gt_c) ** 2 / gt_c)
    rmse = jnp.sqrt(wmean((pred_c - gt_c) ** 2))
    pred_log = jnp.log(jnp.maximum(pred_c, 1e-6))
    rmse_log = jnp.sqrt(wmean((pred_log - jnp.log(gt_c)) ** 2))
    return {
        "abs_rel": float(abs_rel),
        "sq_rel": float(sq_rel),
        "rmse": float(rmse),
        "rmse_log": float(rmse_log),
        "a1": float(wmean((thresh < 1.25).astype(jnp.float32))),
        "a2": float(wmean((thresh < 1.25**2).astype(jnp.float32))),
        "a3": float(wmean((thresh < 1.25**3).astype(jnp.float32))),
    }


def normal_metrics(pred: jax.Array, gt: jax.Array) -> Dict[str, float]:
    """(H, W, 3) unit normal maps in [-1, 1]. Parity: metrics.py:152-183."""
    dots = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    ang = jnp.arccos(dots)
    return {
        "mae": float(jnp.mean(ang)),
        "rmse": float(jnp.sqrt(jnp.mean(ang**2))),
        "mean_err": float(jnp.mean(ang)),
        "median_err": float(jnp.median(ang)),
    }


def pd_metrics(pred_points: np.ndarray, gt_points: np.ndarray,
               comp_thresh: float = 0.05) -> Dict[str, float]:
    """Point-cloud accuracy/completeness (metrics.py:11-56): accuracy is
    the 90th percentile of pred->gt NN distance; completeness the fraction
    of gt points with a pred neighbour within `comp_thresh` (5 cm)."""
    from scipy.spatial import cKDTree

    gt_tree = cKDTree(gt_points)
    d_pred_gt, _ = gt_tree.query(pred_points, k=1, workers=-1)
    pred_tree = cKDTree(pred_points)
    d_gt_pred, _ = pred_tree.query(gt_points, k=1, workers=-1)
    return {
        "accuracy": float(np.percentile(d_pred_gt, 90)),
        "completeness": float((d_gt_pred < comp_thresh).mean()),
    }


# --------------------------------------------------------------------------
# LPIPS (VGG16 feature distance) — weights supplied offline
# --------------------------------------------------------------------------

_VGG_LAYERS = [2, 2, 3, 3, 3]  # conv counts per block (VGG16)
_VGG_CHANNELS = [64, 128, 256, 512, 512]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(params, x: jax.Array):
    """x: (H, W, 3) in [-1, 1] (LPIPS convention). Returns 5 feature maps."""
    h = (x - _SHIFT) / _SCALE
    h = h[None]  # NHWC
    feats = []
    i = 0
    for block, n_convs in enumerate(_VGG_LAYERS):
        for _ in range(n_convs):
            w, b = params[f"conv{i}_w"], params[f"conv{i}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            i += 1
        feats.append(h)
        if block < 4:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_from_npz(path: Path):
    """Build an LPIPS callable from an .npz of VGG16 conv weights
    (conv{i}_w HWIO, conv{i}_b) plus linear head weights (lin{j}: (C,)).

    Produce the file offline with
    `python -m dnsplatter_tpu.scripts.export_lpips_weights` on a machine
    with torchvision + lpips installed.
    """
    z = np.load(path)
    params = {k: jnp.asarray(z[k]) for k in z.files}

    @jax.jit
    def lpips(pred, gt):
        a = _vgg_features(params, pred * 2.0 - 1.0)
        b = _vgg_features(params, gt * 2.0 - 1.0)
        total = 0.0
        for j, (fa, fb) in enumerate(zip(a, b)):
            na = fa / jnp.maximum(
                jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10
            )
            nb = fb / jnp.maximum(
                jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10
            )
            d = (na - nb) ** 2
            lin = params[f"lin{j}"]
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
        return total

    return lpips
