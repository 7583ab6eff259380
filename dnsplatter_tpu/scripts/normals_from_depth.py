"""Generate normal-map priors from sensor depths.

Parity: dn_splatter/scripts/normals_from_pretrain.py `normals_from_depths`
(:412-505): backproject each sensor depth, compute cross-product normals,
orient toward the camera, and save them in the omnidata png convention the
dataparsers load (`normals_from_pretrain/` folder). This is the
`normals_from="depth"` path; pretrained-network normals (Omnidata/DSINE)
remain optional offline torch tools.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.normals import normal_from_depth_image


def normal_image_from_depth(
    depth: np.ndarray, fx: float, fy: float, cx: float, cy: float
) -> np.ndarray:
    """(H, W, 3) png-encodable normals in [0, 1], omnidata convention."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    n = np.asarray(normal_from_depth_image(jnp.asarray(d), fx, fy, cx, cy))
    # orient toward the camera (OpenCV frame: camera looks +z)
    flip = np.where(n[..., 2:3] > 0, -1.0, 1.0)
    n = n * flip
    # store with the omnidata OpenGL flip the loaders undo (io.read_normal)
    n = n * np.array([1.0, -1.0, -1.0])
    return (n + 1.0) * 0.5


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--depth-dir", type=Path, default=None)
    p.add_argument("--output-dir", type=Path, default=None)
    p.add_argument("--fx", type=float, required=True)
    p.add_argument("--fy", type=float, required=True)
    p.add_argument("--cx", type=float, required=True)
    p.add_argument("--cy", type=float, required=True)
    p.add_argument("--depth-unit", type=float, default=1e-3)
    args = p.parse_args(argv)

    from dnsplatter_tpu.data import io

    depth_dir = args.depth_dir or args.data / "depth"
    out_dir = args.output_dir or args.data / "normals_from_pretrain"
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    for f in sorted(depth_dir.glob("*")):
        if f.suffix not in (".png", ".npy"):
            continue
        depth = io.read_depth(f, args.depth_unit)
        img = normal_image_from_depth(depth, args.fx, args.fy, args.cx,
                                      args.cy)
        io.write_image(out_dir / f"{f.stem}.png", img)
        count += 1
    print(f"wrote {count} normal maps to {out_dir}")


if __name__ == "__main__":
    main()
