"""Offline evaluation over saved render trees.

Parity: dn_splatter/eval/eval.py — batched PSNR/SSIM/LPIPS/MSE over
pred/gt rgb folders (rgb_eval, :36-101), depth metrics over saved .npy
depths (depth_eval, :104-185), and the Faro-reference variant where gt
depths come from rendered scanner meshes (:188-272). Also the MuSHRoom
with/within protocol aggregation (dn_pipeline.py:498-545): metrics are
averaged separately per protocol and jointly.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.eval import metrics as M


def rgb_eval(pred_dir: Path, gt_dir: Path, lpips_fn=None) -> Dict[str, float]:
    from dnsplatter_tpu.data import io

    rows: List[Dict[str, float]] = []
    for f in sorted(Path(pred_dir).glob("*.png")):
        g = Path(gt_dir) / f.name
        if not g.exists():
            continue
        pred = jnp.asarray(io.read_image(f))
        gt = jnp.asarray(io.read_image(g))
        rows.append(M.rgb_metrics(pred, gt, lpips_fn))
    return _aggregate(rows)


def depth_eval(pred_dir: Path, gt_dir: Path) -> Dict[str, float]:
    rows = []
    for f in sorted(Path(pred_dir).glob("*.npy")):
        g = Path(gt_dir) / f.name
        if not g.exists():
            continue
        rows.append(
            M.depth_metrics(jnp.asarray(np.load(f)), jnp.asarray(np.load(g)))
        )
    return _aggregate(rows)


def depth_eval_faro(pred_dir: Path, faro_dir: Path,
                    depth_unit: float = 1e-3) -> Dict[str, float]:
    """Rendered .npy depths vs Faro scanner reference pngs
    (mushroom_utils/eval_faro.py:29-170)."""
    from dnsplatter_tpu.data import io

    rows = []
    for f in sorted(Path(pred_dir).glob("*.npy")):
        g = Path(faro_dir) / f"{f.stem}.png"
        if not g.exists():
            continue
        gt = io.read_depth(g, depth_unit)
        rows.append(M.depth_metrics(jnp.asarray(np.load(f)), jnp.asarray(gt)))
    return _aggregate(rows)


def _aggregate(rows: List[Dict[str, float]]) -> Dict[str, float]:
    if not rows:
        return {"num_images": 0}
    out: Dict[str, float] = {}
    for k in rows[0]:
        vals = np.array([r[k] for r in rows], np.float64)
        out[k] = float(np.nanmean(vals))
        out[f"{k}_std"] = float(np.nanstd(vals))
    out["num_images"] = len(rows)
    return out


def aggregate_protocols(
    per_image: List[Dict[str, float]],
    protocol_labels: List[str],
) -> Dict[str, float]:
    """MuSHRoom with/within split aggregation (dn_pipeline.py:498-545):
    average each metric per protocol label plus the joint mean."""
    out: Dict[str, float] = {}
    labels = sorted(set(protocol_labels))
    for lab in labels:
        rows = [r for r, l in zip(per_image, protocol_labels) if l == lab]
        for k, v in _aggregate(rows).items():
            out[f"{lab}_{k}"] = v
    for k, v in _aggregate(per_image).items():
        out[k] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Offline metrics over saved render trees"
    )
    p.add_argument("--renders", type=Path, required=True,
                   help="dir with pred/ and gt/ subtrees")
    p.add_argument("--lpips-weights", type=Path, default=None)
    p.add_argument("--faro-depths", type=Path, default=None)
    args = p.parse_args(argv)

    lpips_fn = None
    if args.lpips_weights:
        lpips_fn = M.lpips_from_npz(args.lpips_weights)
    result = {}
    if lpips_fn is None:
        # surface WHAT the lpips number is: without a weights npz the
        # fallback is a deterministic random-VGG perceptual distance,
        # valid for relative comparisons only — not vs published tables
        result["lpips_kind"] = M.default_lpips_kind()
    r = args.renders
    if (r / "pred/rgb").exists():
        result["rgb"] = rgb_eval(r / "pred/rgb", r / "gt/rgb", lpips_fn)
    if (r / "pred/depth").exists() and (r / "gt/depth").exists():
        result["depth"] = depth_eval(r / "pred/depth", r / "gt/depth")
    if args.faro_depths:
        result["faro_depth"] = depth_eval_faro(r / "pred/depth",
                                               args.faro_depths)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
