"""Generic nerfstudio `transforms.json` dataparser with priors.

Parity target: dn_splatter/data/normal_nerfstudio.py (NormalNerfstudio on
top of nerfstudio's Nerfstudio parser): per-frame or global intrinsics,
OpenGL c2w poses, auto orientation ('up') + centering + auto scale,
fraction/interval/filename/all eval splits, `mono_depth/*_aligned.npy`
priors, `normals_from_pretrain/` normal maps, optional confidence masks,
and a seed point cloud from a .ply referenced by the json or found next
to it.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

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
class NerfstudioParserConfig:
    data: Path = Path(".")
    eval_mode: str = "fraction"  # fraction | interval | filename | all
    train_split_fraction: float = 0.9
    eval_interval: int = 8
    orientation_method: str = "up"
    center_method: str = "poses"
    auto_scale_poses: bool = True
    scale_factor: float = 1.0
    depth_unit_scale_factor: float = 1e-3
    load_3D_points: bool = True
    load_depths: bool = True
    load_normals: bool = True
    load_confidence: bool = False
    normal_format: str = "omnidata"
    downscale_factor: Optional[int] = None


def _natsort(paths: List[Path]) -> List[Path]:
    import re

    def key(p: Path):
        return [
            int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", p.name)
        ]

    return sorted(paths, key=key)


def _split_indices(n: int, cfg: NerfstudioParserConfig, split: str,
                   filenames=None, meta=None) -> np.ndarray:
    if cfg.eval_mode == "all" or n <= 1:
        return np.arange(n)
    if cfg.eval_mode == "filename" and meta is not None:
        # frames tagged via 'train_filenames'/'test_filenames' lists
        train_names = set(meta.get("train_filenames", []))
        if train_names:
            is_train = np.array(
                [str(f) in train_names for f in filenames]
            )
            return np.where(is_train if split == "train" else ~is_train)[0]
    if cfg.eval_mode == "interval":
        eval_idx = np.arange(0, n, cfg.eval_interval)
    else:  # fraction (nerfstudio's equispaced selection)
        n_train = int(np.ceil(n * cfg.train_split_fraction))
        train_idx = np.linspace(0, n - 1, n_train).round().astype(int)
        train_idx = np.unique(train_idx)
        eval_idx = np.setdiff1d(np.arange(n), train_idx)
        return train_idx if split == "train" else eval_idx
    train_idx = np.setdiff1d(np.arange(n), eval_idx)
    return train_idx if split == "train" else eval_idx


@register("normal-nerfstudio")
def parse(cfg: NerfstudioParserConfig, split: str = "train") -> SceneDataset:
    data_dir = Path(cfg.data)
    meta = json.loads((data_dir / "transforms.json").read_text())

    frames_meta = meta["frames"]
    # NATSORT the frames exactly like the prior folders below (the
    # reference relies on natsorted filename alignment): a plain
    # lexicographic sort misaligns non-zero-padded names (frame_10 would
    # sort before frame_2) and every frame would receive another frame's
    # priors.
    import re as _re

    def _natkey(name: str):
        return [int(t) if t.isdigit() else t
                for t in _re.split(r"(\d+)", name)]

    frames_meta = sorted(frames_meta,
                         key=lambda fr: _natkey(Path(fr["file_path"]).name))

    poses = []
    keep = []
    for fr in frames_meta:
        img = data_dir / fr["file_path"]
        if not img.exists():
            # nerfstudio allows paths relative to json parent dir variants
            alt = data_dir / Path(fr["file_path"]).name
            if alt.exists():
                fr["file_path"] = alt.name
            else:
                continue
        keep.append(fr)
        m = np.array(fr["transform_matrix"], np.float64)
        if m.shape == (3, 4):
            m = np.concatenate([m, [[0, 0, 0, 1]]], 0)
        poses.append(m)
    frames_meta = keep
    poses = np.stack(poses)

    orientation = meta.get("orientation_override", cfg.orientation_method)
    poses, transform = auto_orient_and_center_poses(
        poses, method=orientation, center_method=cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        poses, scale = auto_scale(poses, cfg.scale_factor)
    else:
        poses[:, :3, 3] *= cfg.scale_factor
        scale = cfg.scale_factor

    # Prior folders (normal_nerfstudio.py:63-83).
    normal_paths = _natsort(list((data_dir / "normals_from_pretrain").glob("*")))
    depth_paths = _natsort(
        list((data_dir / "mono_depth").glob("*_aligned.npy"))
    ) or _natsort(list((data_dir / "mono_depth").glob("*.npy")))
    conf_paths = _natsort(list((data_dir / "confidence").glob("*")))

    def _stem_map(paths: List[Path]):
        # exact prior stems first; then '<stem>_suffix' variants (e.g.
        # frame_1_aligned.npy -> frame_1) only where no exact file exists.
        # A sorted/bisect prefix probe is WRONG here: digits sort before
        # '_', so frame_10_aligned lands between frame_1 and
        # frame_1_aligned and a single-probe startswith test misses.
        m = {}
        for q in paths:
            m.setdefault(q.stem, q)
        for q in paths:
            if "_" in q.stem:
                m.setdefault(q.stem.rsplit("_", 1)[0], q)
        return m

    _stem_cache = {id(ps): _stem_map(ps)
                   for ps in (normal_paths, depth_paths, conf_paths)}

    def prior_for(i: int, paths: List[Path]) -> Optional[Path]:
        # Prefer filename-stem matching (robust to dropped frames and
        # partially generated priors); fall back to natsorted index
        # alignment, the reference's behavior.
        stem = Path(frames_meta[i]["file_path"]).stem
        hit = _stem_cache[id(paths)].get(stem)
        if hit is not None:
            return hit
        return paths[i] if i < len(paths) else None

    specs: List[FrameSpec] = []
    for i, fr in enumerate(frames_meta):
        fx = fr.get("fl_x", meta.get("fl_x"))
        fy = fr.get("fl_y", meta.get("fl_y"))
        cx = fr.get("cx", meta.get("cx"))
        cy = fr.get("cy", meta.get("cy"))
        w = int(fr.get("w", meta.get("w")))
        h = int(fr.get("h", meta.get("h")))
        d = cfg.downscale_factor or 1
        # nerfstudio transforms.json distortion (k1..k4, p1, p2 +
        # camera_model OPENCV / OPENCV_FISHEYE); undistorted on load.
        import numpy as _np
        dist = _np.array([
            float(fr.get(k, meta.get(k, 0.0)) or 0.0)
            for k in ("k1", "k2", "k3", "k4", "p1", "p2")
        ])
        if not _np.any(dist):
            dist = None
        cam_model = str(meta.get("camera_model", "OPENCV"))
        cam_type = "fisheye" if "FISHEYE" in cam_model else "perspective"
        spec = FrameSpec(
            image_path=data_dir / fr["file_path"],
            c2w=poses[i],
            fx=fx / d, fy=fy / d, cx=cx / d, cy=cy / d,
            width=w // d, height=h // d,
            sensor_depth_path=(
                data_dir / fr["depth_file_path"]
                if "depth_file_path" in fr and cfg.load_depths
                else None
            ),
            mono_depth_path=(
                prior_for(i, depth_paths) if cfg.load_depths else None
            ),
            normal_path=(
                prior_for(i, normal_paths) if cfg.load_normals else None
            ),
            distortion=dist,
            camera_type=cam_type,
            confidence_path=(
                prior_for(i, conf_paths) if cfg.load_confidence else None
            ),
            mask_path=(
                data_dir / fr["mask_path"] if "mask_path" in fr else None
            ),
        )
        specs.append(spec)

    idx = _split_indices(
        len(specs), cfg, split,
        filenames=[fr["file_path"] for fr in frames_meta], meta=meta,
    )
    specs = [specs[i] for i in idx]

    seed_pts = seed_cols = seed_nrm = None
    if cfg.load_3D_points:
        ply_path = None
        if "ply_file_path" in meta:
            ply_path = data_dir / meta["ply_file_path"]
        else:
            cands = list(data_dir.glob("*.ply")) + list(
                (data_dir / "sparse_pc").glob("*.ply")
            ) if (data_dir / "sparse_pc").exists() else list(data_dir.glob("*.ply"))
            if cands:
                ply_path = cands[0]
        if ply_path is not None and ply_path.exists():
            cloud = io.read_ply(ply_path)
            seed_pts = apply_transform_to_points(
                cloud["points"], transform, scale
            )
            seed_cols = cloud.get("colors")
            if "normals" in cloud:
                seed_nrm = cloud["normals"] @ transform[:3, :3].T

    return SceneDataset(
        frames=specs,
        depth_unit_scale_factor=cfg.depth_unit_scale_factor,
        dataparser_scale=scale,
        normal_format=cfg.normal_format,
        seed_points=seed_pts,
        seed_colors=seed_cols,
        seed_normals=seed_nrm,
    )
