"""Error heat-map visualisation between rendered and gt images.

Parity: dn_splatter/scripts/vis_errors.py — per-pixel |error| maps for
rgb/depth/normal renders with the worst regions highlighted.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def error_heatmap(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    import matplotlib

    err = np.abs(pred - gt).mean(-1) if pred.ndim == 3 else np.abs(pred - gt)
    hi = max(np.percentile(err, 99), 1e-8)
    return matplotlib.colormaps["inferno"](np.clip(err / hi, 0, 1))[..., :3]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--renders", type=Path, required=True,
                   help="evaluate() output dir with pred/ and gt/ trees")
    p.add_argument("--output-dir", type=Path, default=None)
    args = p.parse_args(argv)

    from dnsplatter_tpu.data import io

    out_dir = args.output_dir or args.renders / "errors"
    out_dir.mkdir(parents=True, exist_ok=True)
    for kind in ("rgb", "normal"):
        pred_dir = args.renders / "pred" / kind
        gt_dir = args.renders / "gt" / kind
        if not pred_dir.exists() or not gt_dir.exists():
            continue
        for f in sorted(pred_dir.glob("*.png")):
            g = gt_dir / f.name
            if not g.exists():
                continue
            hm = error_heatmap(io.read_image(f), io.read_image(g))
            io.write_image(out_dir / f"{kind}_{f.name}", hm)
    # depth errors from npy
    pred_dir = args.renders / "pred" / "depth"
    gt_dir = args.renders / "gt" / "depth"
    if pred_dir.exists() and gt_dir.exists():
        for f in sorted(pred_dir.glob("*.npy")):
            g = gt_dir / f.name
            if not g.exists():
                continue
            hm = error_heatmap(np.load(f)[..., 0], np.load(g)[..., 0])
            io.write_image(out_dir / f"depth_{f.stem}.png", hm)
    print(f"error maps in {out_dir}")


if __name__ == "__main__":
    main()
