"""MuSHRoom dataset parser (parity: dn_splatter/data/mushroom_dataparser.py).

Layout: <room>/<mode>/{long_capture, short_capture}/ with
transformations.json (or transformations_colmap.json when Faro reference
depths are used), images/, depth/, optional normals + depth_normals_mask;
seed cloud from <room>/<mode>_pointcloud.ply.

Eval protocols (mushroom_dataparser.py:66, 318-327):
  within  train on long capture, eval on its test.txt frames
  with    train on long capture, eval on the short capture
  all     both eval sets concatenated
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional

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
class MushroomParserConfig:
    data: Path = Path(".")
    mode: str = "iphone"  # or "kinect"
    eval_mode: str = "with"  # with | within | all
    load_depths: bool = True
    load_normals: bool = True
    load_depth_confidence_masks: bool = False
    use_faro_scanner_depths: bool = False
    auto_scale_poses: bool = True
    orientation_method: str = "up"
    center_method: str = "poses"
    load_3D_points: bool = True
    depth_unit_scale_factor: float = 1e-3
    max_image_dim: int = 1600  # auto-downscale target (:868-886)
    # Seed-cloud policy (mushroom_dataparser.py:474-568): regenerate the
    # <mode>_pointcloud.ply from capture data when missing, and resample
    # it to exactly num_init_points.
    num_init_points: int = 1_000_000
    regenerate_seed_cloud: bool = True
    seed_cloud_tsdf: bool = False  # TSDF-fuse instead of backprojection
    # Prior autogeneration (:579-697): the reference runs gated networks
    # (ZoeDepth/Omnidata); the in-repo weight-free route derives normals
    # from the sensor depth when normals_from_pretrain/ is absent.
    auto_generate_normals: bool = True


def _load_capture(capture_dir: Path, cfg: MushroomParserConfig):
    """Read one capture's transformations.json into FrameSpecs + poses."""
    name = (
        "transformations_colmap.json"
        if cfg.use_faro_scanner_depths
        else "transformations.json"
    )
    meta_path = capture_dir / name
    if not meta_path.exists():
        meta_path = capture_dir / "transformations.json"
    meta = json.loads(meta_path.read_text())
    frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])

    specs, poses = [], []
    for fr in frames:
        img = capture_dir / fr["file_path"]
        if not img.exists():
            continue
        m = np.array(fr["transform_matrix"], np.float64)
        if m.shape == (3, 4):
            m = np.concatenate([m, [[0, 0, 0, 1]]], 0)
        poses.append(m)
        fx = fr.get("fl_x", meta.get("fl_x"))
        fy = fr.get("fl_y", meta.get("fl_y"))
        cx = fr.get("cx", meta.get("cx"))
        cy = fr.get("cy", meta.get("cy"))
        w = int(fr.get("w", meta.get("w")))
        h = int(fr.get("h", meta.get("h")))
        d = max(1, int(np.ceil(max(w, h) / cfg.max_image_dim)))
        depth = None
        if cfg.load_depths:
            if "depth_file_path" in fr:
                depth = capture_dir / fr["depth_file_path"]
            else:
                cand = capture_dir / "depth" / (Path(fr["file_path"]).stem + ".png")
                depth = cand if cand.exists() else None
        normal = None
        if cfg.load_normals:
            for d_name in ("normals_from_pretrain", "normals_from_depth"):
                cand = (
                    capture_dir / d_name
                    / (Path(fr["file_path"]).stem + ".png")
                )
                if cand.exists():
                    normal = cand
                    break
        conf = None
        if cfg.load_depth_confidence_masks:
            stem = Path(fr["file_path"]).stem
            for ext in (".png", ".jpg"):  # ours: png; reference ships jpg
                cand = capture_dir / "depth_normals_mask" / (stem + ext)
                if cand.exists():
                    conf = cand
                    break
        specs.append(
            FrameSpec(
                image_path=img,
                c2w=m,  # replaced after global orientation
                fx=fx / d, fy=fy / d, cx=cx / d, cy=cy / d,
                width=w // d, height=h // d,
                sensor_depth_path=depth,
                normal_path=normal,
                confidence_path=conf,
            )
        )
    return specs, np.stack(poses) if poses else np.zeros((0, 4, 4))


def _ensure_confidence_masks(capture_dir: Path, specs, cfg) -> None:
    """Generate depth<->normal consistency masks when missing (the
    reference regenerates them via DepthToNormal on demand,
    mushroom_dataparser.py:180-192)."""
    out_dir = capture_dir / "depth_normals_mask"
    # regenerate when only legacy lossy .jpg masks exist (see the PNG
    # note below); the loader prefers .png so stale jpgs stay unused
    if (out_dir.exists() and any(out_dir.glob("*.png"))) or not specs:
        return
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.scripts.depth_normal_consistency import (
        consistency_mask,
    )

    out_dir.mkdir(parents=True, exist_ok=True)
    for sp in specs:
        if sp.sensor_depth_path is None or sp.normal_path is None:
            continue
        depth = io.read_depth(sp.sensor_depth_path,
                              cfg.depth_unit_scale_factor)
        normal = io.read_normal(sp.normal_path, "omnidata")
        if normal.shape[:2] != depth.shape[:2]:
            normal = io.resize_image(normal, depth.shape[0], depth.shape[1])
        # intrinsics at the depth resolution
        sy = depth.shape[0] / sp.height
        sx = depth.shape[1] / sp.width
        mask = consistency_mask(depth, normal, sp.fx * sx, sp.fy * sy,
                                sp.cx * sx, sp.cy * sy)
        # PNG, not JPEG: the mask is a binary {0, 255} gate and the
        # AGS depth filter keeps gt where confidence > 0 — lossy "bad"
        # pixels decoding to 250-254 would silently disable the filter
        io.write_image(out_dir / f"{sp.image_path.stem}.png",
                       mask[..., None] / 255.0)
        sp.confidence_path = out_dir / f"{sp.image_path.stem}.png"


def _ensure_normals(capture_dir: Path, specs, cfg) -> None:
    """Derive per-frame normal maps from sensor depth when no
    normals_from_pretrain/ exists (reference autogenerates missing priors
    in the parser, mushroom_dataparser.py:579-697; the weight-free route
    here is scripts/normals_from_depth)."""
    if not cfg.auto_generate_normals or not specs:
        return
    if any(sp.normal_path is not None for sp in specs):
        return
    if not any(sp.sensor_depth_path is not None for sp in specs):
        return
    from dnsplatter_tpu.scripts.normals_from_depth import (
        normal_image_from_depth,
    )

    out_dir = capture_dir / "normals_from_depth"
    out_dir.mkdir(parents=True, exist_ok=True)
    for sp in specs:
        if sp.sensor_depth_path is None:
            continue
        out = out_dir / f"{sp.image_path.stem}.png"
        if not out.exists():
            depth = io.read_depth(sp.sensor_depth_path,
                                  cfg.depth_unit_scale_factor)
            sy = depth.shape[0] / sp.height
            sx = depth.shape[1] / sp.width
            n = normal_image_from_depth(depth, sp.fx * sx, sp.fy * sy,
                                        sp.cx * sx, sp.cy * sy)
            io.write_image(out, n)
        sp.normal_path = out


def _ensure_seed_cloud(cfg: MushroomParserConfig) -> Optional[Path]:
    """Locate (or reconstruct) the seed cloud
    (mushroom_dataparser.py:474-568)."""
    base = Path(cfg.data) / cfg.mode
    ply = Path(cfg.data) / f"{cfg.mode}_pointcloud.ply"
    if ply.exists():
        return ply
    cands = list(Path(cfg.data).glob("*.ply"))
    if cands:
        return cands[0]
    if not cfg.regenerate_seed_cloud:
        return None
    from dnsplatter_tpu.data import pointcloud_utils as pu

    long_dir = base / "long_capture"
    try:
        if cfg.mode == "kinect" and (long_dir / "PointCloud").exists():
            return pu.generate_kinect_pointcloud(
                long_dir, ply, num_points=cfg.num_init_points
            )
        return pu.generate_iphone_pointcloud(
            long_dir, ply, num_points=cfg.num_init_points,
            use_tsdf=cfg.seed_cloud_tsdf,
            depth_scale=cfg.depth_unit_scale_factor,
        )
    except FileNotFoundError:
        return None


@register("mushroom")
def parse(cfg: MushroomParserConfig, split: str = "train") -> SceneDataset:
    base = Path(cfg.data) / cfg.mode
    long_specs, long_poses = _load_capture(base / "long_capture", cfg)
    short_specs, short_poses = _load_capture(base / "short_capture", cfg)
    if cfg.load_normals:
        _ensure_normals(base / "long_capture", long_specs, cfg)
        _ensure_normals(base / "short_capture", short_specs, cfg)
    if cfg.load_depth_confidence_masks:
        _ensure_confidence_masks(base / "long_capture", long_specs, cfg)
        _ensure_confidence_masks(base / "short_capture", short_specs, cfg)

    all_poses = np.concatenate([long_poses, short_poses])
    all_poses, transform = auto_orient_and_center_poses(
        all_poses, cfg.orientation_method, cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        all_poses, scale = auto_scale(all_poses)
    specs = long_specs + short_specs
    for s, p in zip(specs, all_poses):
        s.c2w = p

    n_long = len(long_specs)
    # test.txt eval frames within the long capture (:285-306).
    test_txt = base / "long_capture" / "test.txt"
    test_names = set()
    if test_txt.exists():
        for line in test_txt.read_text().splitlines():
            line = line.strip()
            if line:
                test_names.add(line)
    is_test_long = np.array(
        [sp.image_path.stem in test_names for sp in long_specs]
    ) if n_long else np.zeros(0, bool)

    i_train = [i for i in range(n_long) if not is_test_long[i]]
    i_eval_within = [i for i in range(n_long) if is_test_long[i]]
    i_eval_with = list(range(n_long, len(specs)))
    if cfg.eval_mode == "within":
        i_eval = i_eval_within
    elif cfg.eval_mode == "with":
        i_eval = i_eval_with
    else:
        i_eval = i_eval_within + i_eval_with

    idx = i_train if split == "train" else i_eval
    frames = [specs[i] for i in idx]
    protocols = None
    if split != "train":
        protocols = ["within" if i < n_long else "with" for i in idx]

    ds = SceneDataset(
        frames=frames,
        depth_unit_scale_factor=cfg.depth_unit_scale_factor,
        dataparser_scale=scale,
        normal_format="omnidata",
        protocols=protocols,
    )
    if cfg.load_3D_points:
        ply = _ensure_seed_cloud(cfg)
        if ply and ply.exists():
            cloud = io.read_ply(ply)
            pts = cloud["points"]
            cols = cloud.get("colors")
            nrms = cloud.get("normals")
            if len(pts) != cfg.num_init_points:
                # regeneration to num_init_points (:521-538)
                from dnsplatter_tpu.data.pointcloud_utils import (
                    resample_to_num_points,
                )

                pts, cols, nrms = resample_to_num_points(
                    pts, cols, nrms, cfg.num_init_points
                )
            ds.seed_points = apply_transform_to_points(pts, transform, scale)
            ds.seed_colors = cols
            if nrms is not None:
                ds.seed_normals = nrms @ transform[:3, :3].T
    return ds
