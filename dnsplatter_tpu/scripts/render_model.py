"""Render a trained model over a dataset split to disk.

Parity: dn_splatter/scripts/render_model.py — dumps pred/gt x
rgb/depth(raw npy + colormapped)/normal trees for offline eval and videos.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def colormap_depth(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Turbo-less simple viridis-like colormap via matplotlib."""
    import matplotlib

    d = depth[..., 0] if depth.ndim == 3 else depth
    lo = near if near is not None else np.percentile(d[d > 0], 2) if (d > 0).any() else 0
    hi = far if far is not None else np.percentile(d[d > 0], 98) if (d > 0).any() else 1
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    return matplotlib.colormaps["viridis"](norm)[..., :3]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--dataparser", default="normal-nerfstudio")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--method", default="dn-splatter")
    args = p.parse_args(argv)

    from dnsplatter_tpu.cli import _load_dataset
    from dnsplatter_tpu.configs import model_config_for_method
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.eval.evaluator import evaluate
    from dnsplatter_tpu.train.trainer import load_checkpoint_arrays

    params, alive, _ = load_checkpoint_arrays(args.checkpoint)
    data = _load_dataset(args.dataparser, args.data, args.split)
    evaluate(
        params, alive, data,
        model_cfg=model_config_for_method(args.method),
        output_dir=args.output_dir, save_renders=True,
    )
    # colormapped depths for quick viewing
    depth_dir = args.output_dir / "pred/depth"
    vis_dir = args.output_dir / "pred/depth_colormaps"
    vis_dir.mkdir(parents=True, exist_ok=True)
    for f in sorted(depth_dir.glob("*.npy")):
        io.write_image(vis_dir / f"{f.stem}.png",
                       colormap_depth(np.load(f)))
    print(f"renders written to {args.output_dir}")


if __name__ == "__main__":
    main()
