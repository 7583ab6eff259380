"""Metric suite (parity: dn_splatter/metrics.py).

  * RGBMetrics: PSNR, SSIM(kernel 11), LPIPS (metrics.py:77-108)
  * DepthMetrics: abs_rel, sq_rel, rmse, rmse_log, delta<1.25^{1,2,3},
    masked at gt > 0.1 (metrics.py:111-149)
  * NormalMetrics: MAE/RMSE in radians + mean/median (metrics.py:152-183)
  * PDMetrics: point-cloud accuracy (90th-percentile NN distance) and
    completeness (% of gt within 5 cm) via scipy cKDTree (metrics.py:11-56)

LPIPS needs pretrained VGG16 features. Resolution order (see
`default_lpips`):
  1. an .npz of official VGG16-LPIPS weights (export offline with
     scripts/export_lpips_weights.py) found via $DNSPLATTER_LPIPS_WEIGHTS,
     <repo>/weights/lpips_vgg.npz, or ~/.cache/dnsplatter_tpu/;
  2. otherwise a DETERMINISTIC randomly-initialized VGG16 feature
     distance (fixed seed). Random-convnet features are an established
    perceptual metric (Amir & Weiss 2021, "Understanding and
    Simplifying Perceptual Distances"): they rank image similarity much
    like trained LPIPS, so the fallback is valid for RELATIVE
    comparisons within this framework, but its absolute values are NOT
    comparable to published LPIPS tables — the metric dict carries
    `lpips_kind` so results are never silently conflated.
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
    if lpips_fn is None:
        lpips_fn = default_lpips()
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
    """(H, W, 3) normal maps in the [0, 1] ENCODING, exactly as the
    reference computes them (dn_model.py:897-917 passes the encoded maps
    straight into NormalMetrics, metrics.py:152-183): mae is the arccos
    of the clamped dot of the ENCODED vectors; rmse/mean/median are
    component-value statistics of (gt - pred), not angles. Quirky, but
    this is what the published tables report."""
    dots = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    diff = gt - pred
    return {
        "mae": float(jnp.mean(jnp.arccos(dots))),
        "rmse": float(jnp.sqrt(jnp.mean(diff**2))),
        "mean_err": float(jnp.mean(jnp.abs(diff))),
        "median_err": float(jnp.median(jnp.abs(diff))),
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


def random_vgg_lpips_params(seed: int = 0):
    """Deterministic He-initialized VGG16 + uniform linear heads — the
    random-feature perceptual-distance fallback (see module docstring)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    i = 0
    for block, n_convs in enumerate(_VGG_LAYERS):
        out_ch = _VGG_CHANNELS[block]
        for _ in range(n_convs):
            fan_in = 3 * 3 * in_ch
            w = rng.normal(0.0, np.sqrt(2.0 / fan_in),
                           (3, 3, in_ch, out_ch)).astype(np.float32)
            params[f"conv{i}_w"] = jnp.asarray(w)
            params[f"conv{i}_b"] = jnp.zeros((out_ch,), jnp.float32)
            in_ch = out_ch
            i += 1
        params[f"lin{block}"] = jnp.full((out_ch,), 1.0 / out_ch, jnp.float32)
    return params


def _lpips_from_params(params):
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


_DEFAULT_LPIPS = None
_DEFAULT_LPIPS_KIND = None


def lpips_weight_search_paths():
    import os

    paths = []
    env = os.environ.get("DNSPLATTER_LPIPS_WEIGHTS")
    if env:
        paths.append(Path(env))
    paths.append(Path(__file__).resolve().parents[2] / "weights"
                 / "lpips_vgg.npz")
    paths.append(Path.home() / ".cache" / "dnsplatter_tpu" / "lpips_vgg.npz")
    return paths


def default_lpips():
    """Official-weight LPIPS when an npz is found, else the deterministic
    random-VGG fallback. Cached; kind via `default_lpips_kind()`."""
    global _DEFAULT_LPIPS, _DEFAULT_LPIPS_KIND
    if _DEFAULT_LPIPS is not None:
        return _DEFAULT_LPIPS
    for p in lpips_weight_search_paths():
        if p.exists():
            _DEFAULT_LPIPS = lpips_from_npz(p)
            _DEFAULT_LPIPS_KIND = "vgg16-lpips"
            return _DEFAULT_LPIPS
    _DEFAULT_LPIPS = _lpips_from_params(random_vgg_lpips_params())
    _DEFAULT_LPIPS_KIND = "random-vgg(relative-only)"
    return _DEFAULT_LPIPS


def default_lpips_kind() -> str:
    if _DEFAULT_LPIPS_KIND is None:
        default_lpips()
    return _DEFAULT_LPIPS_KIND


def lpips_from_npz(path: Path):
    """Build an LPIPS callable from an .npz of VGG16 conv weights
    (conv{i}_w HWIO, conv{i}_b) plus linear head weights (lin{j}: (C,)).

    Produce the file offline with
    `python -m dnsplatter_tpu.scripts.export_lpips_weights` on a machine
    with torchvision + lpips installed.
    """
    z = np.load(path)
    params = {k: jnp.asarray(z[k]) for k in z.files}
    return _lpips_from_params(params)
