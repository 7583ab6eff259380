"""Depth <-> normal consistency masks (AGS-Mesh confidence inputs).

Parity: dn_splatter/scripts/depth_normal_consistency.py (threshold 20 deg)
and depth_to_normal.py (threshold 10 deg): backproject sensor depth to a
point cloud, estimate its normals from local neighbourhoods, orient them
toward the camera, compare with the monocular normal map, and write a
binary mask image where the angular disagreement exceeds the threshold.
The reference uses Open3D 200-NN normal estimation; here normals come
from the depth-gradient cross product with a small smoothing window —
the same signal without the Open3D dependency, evaluated on device.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.normals import normal_from_depth_image


def consistency_mask(
    sensor_depth: np.ndarray,  # (H, W) or (H, W, 1), metric
    mono_normal01: np.ndarray,  # (H, W, 3) in [0, 1], camera frame (OpenCV)
    fx: float, fy: float, cx: float, cy: float,
    angle_thresh_deg: float = 20.0,
    smooth: int = 3,
) -> np.ndarray:
    """(H, W) uint8 mask: 255 where depth and mono normal DISAGREE."""
    d = jnp.asarray(
        sensor_depth[..., 0] if sensor_depth.ndim == 3 else sensor_depth
    )
    if smooth > 1:
        k = jnp.ones((smooth, smooth)) / (smooth * smooth)
        d = jax.lax.conv_general_dilated(
            d[None, None], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]
    n_depth = normal_from_depth_image(d, fx, fy, cx, cy)  # OpenCV cam frame
    # orient toward camera (view dir is +z in OpenCV; surface normals
    # facing the camera have negative z)
    flip = jnp.where(n_depth[..., 2:3] > 0, -1.0, 1.0)
    n_depth = n_depth * flip

    n_mono = 2.0 * jnp.asarray(mono_normal01) - 1.0
    n_mono = n_mono / jnp.maximum(
        jnp.linalg.norm(n_mono, axis=-1, keepdims=True), 1e-8
    )
    dots = jnp.clip(jnp.sum(n_depth * n_mono, axis=-1), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(dots))
    valid = (
        (jnp.asarray(
            sensor_depth[..., 0] if sensor_depth.ndim == 3 else sensor_depth
        ) > 0)
        & (jnp.linalg.norm(n_depth, axis=-1) > 0.5)
    )
    bad = (ang > angle_thresh_deg) & valid
    return np.asarray(jnp.where(bad, 255, 0).astype(jnp.uint8))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--depth-dir", type=Path, default=None)
    p.add_argument("--normal-dir", type=Path, default=None)
    p.add_argument("--output-dir", type=Path, default=None)
    p.add_argument("--fx", type=float, required=True)
    p.add_argument("--fy", type=float, required=True)
    p.add_argument("--cx", type=float, required=True)
    p.add_argument("--cy", type=float, required=True)
    p.add_argument("--depth-unit", type=float, default=1e-3)
    p.add_argument("--angle-thresh", type=float, default=20.0)
    args = p.parse_args(argv)

    from dnsplatter_tpu.data import io

    depth_dir = args.depth_dir or args.data / "depth"
    normal_dir = args.normal_dir or args.data / "normals_from_pretrain"
    out_dir = args.output_dir or args.data / "depth_normals_mask"
    out_dir.mkdir(parents=True, exist_ok=True)

    depths = sorted(depth_dir.glob("*"))
    normals = sorted(normal_dir.glob("*"))
    for dp, npth in zip(depths, normals):
        depth = io.read_depth(dp, args.depth_unit)
        normal = io.read_normal(npth, format="omnidata")
        mask = consistency_mask(depth, normal, args.fx, args.fy,
                                args.cx, args.cy, args.angle_thresh)
        io.write_image(out_dir / f"{dp.stem}.png", mask[..., None] / 255.0)
    print(f"wrote {len(depths)} masks to {out_dir}")


if __name__ == "__main__":
    main()
