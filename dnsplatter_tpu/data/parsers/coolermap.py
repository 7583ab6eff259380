"""COLMAP dataparser for arbitrary captures (parity:
dn_splatter/data/coolermap_dataparser.py).

Layout: <data>/images + <data>/colmap/sparse/0 (binary model). Interval
eval split (coolermap_dataparser.py:58-66), aligned mono depths from
<data>/mono_depth/*_aligned.npy, optional normals from
normals_from_pretrain/, seed cloud from COLMAP points3D.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from dnsplatter_tpu.data import colmap_utils as cu
from dnsplatter_tpu.data.dataset import FrameSpec, SceneDataset
from dnsplatter_tpu.data.parsers import register
from dnsplatter_tpu.data.poses import (
    apply_transform_to_points,
    auto_orient_and_center_poses,
    auto_scale,
)


@dataclasses.dataclass(frozen=True)
class CoolerMapParserConfig:
    data: Path = Path(".")
    images_path: Path = Path("images")
    colmap_path: Path = Path("colmap/sparse/0")
    eval_mode: str = "interval"
    eval_interval: int = 8
    load_every: int = 1
    auto_scale_poses: bool = True
    orientation_method: str = "up"
    center_method: str = "poses"
    load_3D_points: bool = True
    load_depths: bool = True
    load_normals: bool = True


@register("coolermap")
def parse(cfg: CoolerMapParserConfig, split: str = "train") -> SceneDataset:
    data_dir = Path(cfg.data)
    cams, imgs, xyz, rgb = cu.read_model(data_dir / cfg.colmap_path)

    items = sorted(imgs.values(), key=lambda im: im.name)
    poses = np.stack([cu.image_c2w_opengl(im) for im in items])
    poses, transform, = auto_orient_and_center_poses(
        poses, cfg.orientation_method, cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        poses, scale = auto_scale(poses)

    depth_dir = data_dir / "mono_depth"
    depth_paths = sorted(depth_dir.glob("*_aligned.npy")) if depth_dir.exists() else []
    normal_dir = data_dir / "normals_from_pretrain"
    normal_paths = sorted(normal_dir.glob("*")) if normal_dir.exists() else []

    frames = []
    for i, im in enumerate(items):
        cam = cams[im.camera_id]
        fx, fy, cx, cy = cu.camera_intrinsics(cam)
        dist, cam_type = cu.camera_distortion(cam)
        frames.append(
            FrameSpec(
                image_path=data_dir / cfg.images_path / im.name,
                c2w=poses[i],
                fx=fx, fy=fy, cx=cx, cy=cy,
                width=cam.width, height=cam.height,
                mono_depth_path=(
                    depth_paths[i]
                    if cfg.load_depths and i < len(depth_paths) else None
                ),
                normal_path=(
                    normal_paths[i]
                    if cfg.load_normals and i < len(normal_paths) else None
                ),
                distortion=dist,
                camera_type=cam_type,
            )
        )

    n = len(frames)
    idx = list(range(n))[:: cfg.load_every]
    eval_idx = set(idx[:: cfg.eval_interval]) if cfg.eval_mode == "interval" else set()
    if cfg.eval_mode == "interval":
        idx = [i for i in idx if (i not in eval_idx) == (split == "train")]
    frames = [frames[i] for i in idx]

    ds = SceneDataset(
        frames=frames,
        depth_unit_scale_factor=1.0,  # aligned npy depths are metric
        dataparser_scale=scale,
    )
    if cfg.load_3D_points and xyz is not None:
        ds.seed_points = apply_transform_to_points(xyz, transform, scale)
        ds.seed_colors = rgb
    return ds
