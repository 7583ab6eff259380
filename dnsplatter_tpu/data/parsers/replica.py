"""Replica RGB-D dataparser (parity: dn_splatter/data/replica_dataparser.py).

Layout: <data>/cam_params.json, <data>/<sequence>/traj.txt (flattened 4x4
OpenCV c2w per line), <data>/<sequence>/results/frame*.jpg + depth*.png.
Depth scale 1/6553.5 (replica_dataparser.py:279-281); load_every=25 with
every-5th eval split (:131-140); seed points backprojected from RGB-D.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

from dnsplatter_tpu.data import io
from dnsplatter_tpu.data.dataset import FrameSpec, SceneDataset
from dnsplatter_tpu.data.parsers import register
from dnsplatter_tpu.data.poses import (
    apply_transform_to_points,
    auto_orient_and_center_poses,
    auto_scale,
)


@dataclasses.dataclass(frozen=True)
class ReplicaParserConfig:
    data: Path = Path(".")
    sequence: str = "office0"
    load_every: int = 25
    skip_every_for_val_split: int = 5
    auto_scale_poses: bool = True
    orientation_method: str = "up"
    center_method: str = "poses"
    num_seed_points: int = 200_000
    load_normals: bool = True
    seed: int = 0


@register("replica")
def parse(cfg: ReplicaParserConfig, split: str = "train") -> SceneDataset:
    data_dir = Path(cfg.data)
    seq_dir = data_dir / cfg.sequence
    cam = json.loads((data_dir / "cam_params.json").read_text())["camera"]

    color_paths = sorted((seq_dir / "results").glob("frame*.jpg"))
    depth_paths = sorted((seq_dir / "results").glob("depth*.png"))
    lines = (seq_dir / "traj.txt").read_text().strip().splitlines()
    poses = np.array(
        [list(map(float, l.split())) for l in lines[: len(color_paths)]]
    ).reshape(-1, 4, 4)
    # OpenCV -> OpenGL camera axes (replica_dataparser.py:160-162).
    poses[:, 0:3, 1:3] *= -1

    poses, transform = auto_orient_and_center_poses(
        poses, cfg.orientation_method, cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        poses, scale = auto_scale(poses)

    normal_dir = seq_dir / "normals_from_pretrain"
    # match priors by frame stem (frame000025 -> frame000025.png), NOT by
    # position in the directory listing: priors generated only for the
    # loaded (every-Nth) frames would otherwise shift onto wrong frames
    normal_by_stem = (
        {q.stem: q for q in normal_dir.glob("*.png")}
        if normal_dir.exists() else {}
    )

    indices = list(range(len(color_paths)))[:: cfg.load_every]
    eval_idx = indices[:: cfg.skip_every_for_val_split]
    if split == "train":
        indices = [i for i in indices if i not in eval_idx]
    else:
        indices = eval_idx

    depth_unit = 1.0 / 6553.5
    frames = []
    for i in indices:
        frames.append(
            FrameSpec(
                image_path=color_paths[i],
                c2w=poses[i],
                fx=cam["fx"], fy=cam["fy"], cx=cam["cx"], cy=cam["cy"],
                width=cam["w"], height=cam["h"],
                sensor_depth_path=depth_paths[i],
                normal_path=normal_by_stem.get(color_paths[i].stem),
            )
        )

    ds = SceneDataset(
        frames=frames,
        depth_unit_scale_factor=depth_unit,
        dataparser_scale=scale,
        normal_format="omnidata",
    )

    # Seed cloud: sample gt mesh if present, else backproject RGB-D
    # (replica_dataparser.py:306-355).
    mesh_path = data_dir / f"{cfg.sequence}_mesh.ply"
    if mesh_path.exists():
        cloud = io.read_ply(mesh_path)
        pts = cloud["points"]
        rng = np.random.default_rng(cfg.seed)
        sel = rng.choice(len(pts), min(cfg.num_seed_points, len(pts)),
                         replace=False)
        ds.seed_points = apply_transform_to_points(pts[sel], transform, scale)
        if "colors" in cloud:
            ds.seed_colors = cloud["colors"][sel]
    elif frames:
        ds.seed_points, ds.seed_colors = backproject_seed_cloud(
            ds, cfg.num_seed_points, cfg.seed
        )
    return ds


def backproject_seed_cloud(ds: SceneDataset, num_points: int, seed: int = 0):
    """Uniformly sample RGB-D backprojections across frames."""
    import jax.numpy as jnp

    from dnsplatter_tpu.ops.camera import backproject_depth

    rng = np.random.default_rng(seed)
    per_frame = max(1, num_points // max(len(ds), 1))
    pts_all, col_all = [], []
    for i in range(len(ds)):
        cam, batch = ds.get(i)
        if "sensor_depth" not in batch:
            continue
        depth = batch["sensor_depth"][..., 0]
        c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
        pts = np.asarray(
            backproject_depth(
                jnp.asarray(depth), cam.fx, cam.fy, cam.cx, cam.cy,
                jnp.asarray(c2w_cv),
            )
        ).reshape(-1, 3)
        cols = batch["image"].reshape(-1, 3)
        ok = depth.reshape(-1) > 1e-6
        idx = np.where(ok)[0]
        sel = rng.choice(idx, min(per_frame, len(idx)), replace=False)
        pts_all.append(pts[sel])
        col_all.append(cols[sel])
    return (
        np.concatenate(pts_all).astype(np.float32),
        np.concatenate(col_all).astype(np.float32),
    )
