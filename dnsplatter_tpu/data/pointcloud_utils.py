"""Seed point-cloud generation (MuSHRoom / ScanNet++ RGB-D captures).

Parity: dn_splatter/data/mushroom_utils/pointcloud_utils.py:14-196 and
scannetpp_utils/pointcloud_utils.py:10-84 — the reference reconstructs a
seed cloud when the dataset ships none (or the wrong size): kinect from
per-frame SpectacularAI PointCloud/*.ply files re-posed into the COLMAP
frame, iphone/scannetpp by fusing the RGB-D train frames in a TSDF
volume and sampling the surface. The reference's exact regeneration to
`num_init_points` (mushroom_dataparser.py:474-568) is reproduced by
`resample_to_num_points`.

Implementation notes (TPU build): the fusion volume is this framework's
own JAX TSDF (mesh/tsdf.py, voxel 0.04 / trunc 0.2 like the reference's
o3d ScalableTSDFVolume call); a `use_tsdf=False` fast path backprojects
depths directly with a voxel de-dup — same role, no fusion cost. Normals
come from the depth maps (scripts/normals_from_depth math), giving
oriented seeds for normal-seeded Gaussian init without any network.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

OPENGL_TO_OPENCV = np.diag([1.0, -1.0, -1.0, 1.0])


def resample_to_num_points(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    normals: Optional[np.ndarray],
    num_points: int,
    seed: int = 0,
):
    """Exact-size resampling (without replacement when shrinking, with
    replacement when growing) — mushroom_dataparser.py:182-186 semantics."""
    rng = np.random.default_rng(seed)
    n = len(points)
    if n == 0:
        return points, colors, normals
    idx = rng.choice(n, size=num_points, replace=n < num_points)
    pick = lambda a: None if a is None else a[idx]
    return points[idx], pick(colors), pick(normals)


def _load_frames_meta(capture_dir: Path):
    for name in ("transformations_colmap.json", "transformations.json",
                 "transforms.json"):
        p = capture_dir / name
        if p.exists():
            meta = json.loads(p.read_text())
            return meta
    raise FileNotFoundError(f"no transformations json in {capture_dir}")


def _train_frames(capture_dir: Path, meta) -> List[dict]:
    frames = meta["frames"]
    test_txt = capture_dir / "test.txt"
    if not test_txt.exists():
        return frames
    test = {ln.strip() for ln in test_txt.read_text().splitlines() if ln.strip()}
    return [fr for fr in frames
            if Path(fr["file_path"]).stem not in test]


def _frame_intrinsics(meta, fr):
    g = lambda k: fr.get(k, meta.get(k))
    return (float(g("fl_x")), float(g("fl_y")), float(g("cx")),
            float(g("cy")), int(g("w")), int(g("h")))


def _load_rgbd_frame(capture_dir: Path, meta, fr, depth_scale: float):
    """Load one RGB-D frame: (rgb, depth (H, W, 1), c2w 4x4 OpenGL,
    fx, fy, cx, cy) with intrinsics rescaled to the depth resolution, or
    None when the image/depth files are missing."""
    from dnsplatter_tpu.data import io

    img_path = capture_dir / fr["file_path"]
    dp = fr.get("depth_file_path")
    depth_path = (capture_dir / dp) if dp else (
        capture_dir / "depth" / (Path(fr["file_path"]).stem + ".png")
    )
    if not img_path.exists() or not depth_path.exists():
        return None
    fx, fy, cx, cy, w, h = _frame_intrinsics(meta, fr)
    rgb = io.read_image(img_path)
    depth = io.read_depth(depth_path, depth_scale)
    dh, dw = depth.shape[:2]
    if rgb.shape[:2] != (dh, dw):
        rgb = io.resize_image(rgb, dh, dw)
    sx, sy = dw / w, dh / h
    c2w = np.array(fr["transform_matrix"], np.float64)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], 0)
    return rgb, depth, c2w, fx * sx, fy * sy, cx * sx, cy * sy


def _cap_frames(frames, max_frames):
    """Subsample to AT MOST max_frames (ceil stride; a floor stride can
    keep up to ~2x the cap)."""
    if max_frames and len(frames) > max_frames:
        stride = -(-len(frames) // max_frames)
        return frames[::stride]
    return frames


def backproject_rgbd_cloud(
    capture_dir: Path,
    num_points: int = 1_000_000,
    depth_scale: float = 1e-3,
    depth_trunc: float = 4.0,
    voxel_dedup: float = 0.02,
    with_normals: bool = True,
    max_frames: Optional[int] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Fused (points, colors, normals) from the train RGB-D frames."""
    from dnsplatter_tpu.data import io

    meta = _load_frames_meta(capture_dir)
    frames = _cap_frames(_train_frames(capture_dir, meta), max_frames)
    rng = np.random.default_rng(seed)
    per_frame = (num_points + len(frames)) // max(len(frames), 1)

    pts_l, col_l, nrm_l = [], [], []
    for fr in frames:
        frame = _load_rgbd_frame(capture_dir, meta, fr, depth_scale)
        if frame is None:
            continue
        rgb, depth, c2w, fxd, fyd, cxd, cyd = frame
        depth = depth[..., 0]
        dh, dw = depth.shape
        c2w_cv = c2w @ OPENGL_TO_OPENCV

        us, vs = np.meshgrid(np.arange(dw) + 0.5, np.arange(dh) + 0.5)
        valid = (depth > 1e-4) & (depth < depth_trunc)
        z = depth[valid]
        x = (us[valid] - cxd) * z / fxd
        y = (vs[valid] - cyd) * z / fyd
        pc = np.stack([x, y, z], -1)
        pw = pc @ c2w_cv[:3, :3].T + c2w_cv[:3, 3]
        cols = rgb[valid]

        if with_normals:
            import jax.numpy as jnp

            from dnsplatter_tpu.ops.normals import normal_from_depth_image

            n_cam = np.asarray(normal_from_depth_image(
                jnp.asarray(depth), fxd, fyd, cxd, cyd
            ))
            nw = n_cam[valid] @ c2w_cv[:3, :3].T
        else:
            nw = None

        k = min(per_frame, len(pw))
        sel = rng.choice(len(pw), k, replace=False) if len(pw) > k else \
            np.arange(len(pw))
        pts_l.append(pw[sel])
        col_l.append(cols[sel])
        if nw is not None:
            nrm_l.append(nw[sel])

    if not pts_l:
        raise FileNotFoundError(f"no RGB-D frames under {capture_dir}")
    pts = np.concatenate(pts_l).astype(np.float32)
    cols = np.concatenate(col_l).astype(np.float32)
    nrms = np.concatenate(nrm_l).astype(np.float32) if nrm_l else None

    if voxel_dedup and voxel_dedup > 0:
        key = np.floor(pts / voxel_dedup).astype(np.int64)
        _, first = np.unique(key, axis=0, return_index=True)
        if len(first) >= num_points // 4:  # keep density if dedup too harsh
            pts, cols = pts[first], cols[first]
            if nrms is not None:
                nrms = nrms[first]
    return resample_to_num_points(pts, cols, nrms, num_points, seed)


def tsdf_fused_cloud(
    capture_dir: Path,
    num_points: int = 1_000_000,
    depth_scale: float = 1e-3,
    voxel: float = 0.04,
    trunc: float = 0.2,
    max_frames: int = 60,
    resolution_cap: int = 192,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """TSDF-fusion route (the reference's o3d ScalableTSDFVolume call,
    voxel_length=0.04 / sdf_trunc=0.2) using mesh/tsdf.py; surface
    samples carry vertex colors and face normals."""
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.eval.mesh_metrics import sample_surface
    from dnsplatter_tpu.mesh import tsdf as T

    meta = _load_frames_meta(capture_dir)
    frames = _cap_frames(_train_frames(capture_dir, meta), max_frames)

    loaded = []
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for fr in frames:
        frame = _load_rgbd_frame(capture_dir, meta, fr, depth_scale)
        if frame is None:
            continue
        rgb, depth, c2w, fxd, fyd, cxd, cyd = frame
        loaded.append((depth, rgb, c2w, fxd, fyd, cxd, cyd))
        cam = (c2w @ OPENGL_TO_OPENCV)[:3, 3]
        lo = np.minimum(lo, cam - 4.0)
        hi = np.maximum(hi, cam + 4.0)
    if not loaded:
        raise FileNotFoundError(f"no RGB-D frames under {capture_dir}")

    span = float(np.max(hi - lo))
    voxel = max(voxel, span / resolution_cap)  # cap grid memory
    cfg = T.TSDFConfig(voxel_size=voxel, sdf_trunc=max(trunc, 3 * voxel))
    vol = T.create_volume(lo, hi, cfg)
    for depth, rgb, c2w, fx, fy, cx, cy in loaded:
        vol = T.integrate(vol, depth, rgb, c2w, fx, fy, cx, cy, cfg)
    verts, faces, colors = T.extract_mesh(vol)
    if len(faces) == 0:
        raise RuntimeError("TSDF fusion produced an empty surface")
    pts, nrm = sample_surface(np.asarray(verts), np.asarray(faces),
                              num_points, seed=0)
    # nearest-vertex colors for the samples
    from scipy.spatial import cKDTree

    _, vi = cKDTree(np.asarray(verts)).query(pts, k=1, workers=-1)
    cols = np.asarray(colors)[vi]
    return pts.astype(np.float32), cols.astype(np.float32), nrm


def generate_iphone_pointcloud(
    capture_dir: Path,
    out_path: Path,
    num_points: int = 1_000_000,
    use_tsdf: bool = False,
    depth_scale: float = 1e-3,
) -> Path:
    """MuSHRoom iphone / ScanNet++ iphone seed cloud from RGB-D frames
    (pointcloud_utils.py:90-196 / scannetpp_utils/pointcloud_utils.py)."""
    from dnsplatter_tpu.data import io

    gen = tsdf_fused_cloud if use_tsdf else backproject_rgbd_cloud
    pts, cols, nrms = gen(capture_dir, num_points=num_points,
                          depth_scale=depth_scale)
    io.write_ply(out_path, pts, colors=cols, normals=nrms)
    return out_path


def generate_kinect_pointcloud(
    capture_dir: Path,
    out_path: Path,
    num_points: int = 1_000_000,
    seed: int = 0,
) -> Path:
    """MuSHRoom kinect seed cloud from per-frame SpectacularAI clouds
    (pointcloud_utils.py:14-85): PointCloud/<name>.ply re-posed from the
    capture world (pose/<name>.txt, OpenGL) into the COLMAP frame."""
    from dnsplatter_tpu.data import io

    meta = _load_frames_meta(capture_dir)
    frames = _train_frames(capture_dir, meta)
    rng = random.Random(seed)
    per_frame = (num_points + len(frames)) // max(len(frames), 1)

    pts_l, col_l, nrm_l = [], [], []
    for fr in frames:
        name = Path(fr["file_path"]).stem
        ply = capture_dir / "PointCloud" / f"{name}.ply"
        pose_txt = capture_dir / "pose" / f"{name}.txt"
        if not ply.exists() or not pose_txt.exists():
            continue
        cloud = io.read_ply(ply)
        pts = cloud["points"].astype(np.float64)
        # NOTE: the OPENGL_TO_OPENCV right-multiplication deliberately does
        # NOT cancel between the two poses — the SpectacularAI pose txt and
        # the COLMAP transform_matrix use different camera conventions, and
        # this conjugation reproduces the reference exactly
        # (mushroom_utils/pointcloud_utils.py:52-59).
        original_pose = np.loadtxt(pose_txt).reshape(4, 4) @ OPENGL_TO_OPENCV
        colmap_pose = np.array(fr["transform_matrix"], np.float64)
        if colmap_pose.shape == (3, 4):
            colmap_pose = np.concatenate([colmap_pose, [[0, 0, 0, 1]]], 0)
        m = colmap_pose @ np.linalg.inv(original_pose)
        pts = pts @ m[:3, :3].T + m[:3, 3]
        k = min(per_frame, len(pts))
        sel = np.asarray(rng.sample(range(len(pts)), k))
        pts_l.append(pts[sel])
        if "colors" in cloud:
            col_l.append(cloud["colors"][sel])
        if "normals" in cloud:
            nrm_l.append(cloud["normals"][sel] @ m[:3, :3].T)

    if not pts_l:
        raise FileNotFoundError(
            f"no PointCloud/pose frames under {capture_dir}"
        )
    pts = np.concatenate(pts_l).astype(np.float32)
    cols = np.concatenate(col_l).astype(np.float32) if col_l else None
    nrms = np.concatenate(nrm_l).astype(np.float32) if nrm_l else None
    pts, cols, nrms = resample_to_num_points(pts, cols, nrms, num_points,
                                             seed)
    io.write_ply(out_path, pts, colors=cols, normals=nrms)
    return out_path
