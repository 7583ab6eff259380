"""Iterative Closest Point registration (host-side numpy/scipy).

The reference relies on Open3D's ICP implicitly: MuSHRoom ships
`icp_{iphone,kinect}.json` files holding the SE(3) ("gt_transformation")
that registers each capture's reconstruction frame to the Faro laser
frame, and both the pipeline pcd metrics (dn_pipeline.py:356-450) and the
MuSHRoom mesh eval (eval/eval_mesh_mushroom_vis_cull.py:653-666) load
them before comparing against ground truth. This module provides
  * `icp` — point-to-point / point-to-plane ICP with trimmed
    correspondences (the standard Open3D `registration_icp` recipe),
    so the transformation can be (re)computed when the json is absent;
  * `load_icp_json` / `save_icp_json` — the reference's file format.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def _best_rigid_transform(src: np.ndarray, dst: np.ndarray,
                          weights: Optional[np.ndarray] = None) -> np.ndarray:
    """Closed-form (Kabsch/Umeyama, no scale) SE(3) minimizing
    sum w |R s + t - d|^2."""
    if weights is None:
        weights = np.ones(len(src))
    w = weights / max(weights.sum(), 1e-12)
    mu_s = (src * w[:, None]).sum(0)
    mu_d = (dst * w[:, None]).sum(0)
    s = src - mu_s
    d = dst - mu_d
    h = (s * w[:, None]).T @ d
    u, _, vt = np.linalg.svd(h)
    sgn = np.sign(np.linalg.det(vt.T @ u.T))
    diag = np.diag([1.0, 1.0, sgn])
    r = vt.T @ diag @ u.T
    t = mu_d - r @ mu_s
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


def _point_to_plane_step(src: np.ndarray, dst: np.ndarray,
                         dst_normals: np.ndarray,
                         weights: np.ndarray) -> np.ndarray:
    """One linearized point-to-plane solve: find small (rx, ry, rz, t)
    minimizing sum w ((R s + t - d) . n)^2 with R ~ I + [r]_x."""
    n = dst_normals
    b = -((src - dst) * n).sum(1)
    a = np.concatenate([np.cross(src, n), n], axis=1)  # (N, 6)
    aw = a * weights[:, None]
    ata = aw.T @ a
    atb = aw.T @ b
    try:
        x = np.linalg.solve(ata + 1e-9 * np.eye(6), atb)
    except np.linalg.LinAlgError:
        return np.eye(4)
    rx, ry, rz = x[:3]
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    r = (
        np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    )
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = x[3:]
    return m


def icp(
    source: np.ndarray,
    target: np.ndarray,
    init: Optional[np.ndarray] = None,
    max_iterations: int = 50,
    max_correspondence_distance: float = 0.1,
    method: str = "point_to_point",
    target_normals: Optional[np.ndarray] = None,
    tolerance: float = 1e-7,
    max_points: int = 100_000,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """Register `source` onto `target`; returns (4x4 transform, rmse).

    Correspondences come from a KD-tree NN query each iteration, trimmed
    at `max_correspondence_distance` (Open3D `registration_icp`
    semantics). `method` is "point_to_point" (closed-form Kabsch per
    iteration) or "point_to_plane" (linearized normal-distance solve,
    needs `target_normals`).
    """
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    if len(source) > max_points:
        source = source[rng.choice(len(source), max_points, replace=False)]
    if len(target) > max_points:
        keep = rng.choice(len(target), max_points, replace=False)
        target = target[keep]
        if target_normals is not None:
            target_normals = np.asarray(target_normals)[keep]

    if method == "point_to_plane" and target_normals is None:
        raise ValueError("point_to_plane needs target_normals")

    tree = cKDTree(target)
    transform = np.eye(4) if init is None else np.asarray(init, np.float64)
    cur = source @ transform[:3, :3].T + transform[:3, 3]
    prev_rmse = np.inf
    rmse = np.inf
    for _ in range(max_iterations):
        dist, idx = tree.query(cur, k=1, workers=-1)
        keep = dist < max_correspondence_distance
        if keep.sum() < 6:
            break
        w = np.ones(int(keep.sum()))
        src_k = cur[keep]
        dst_k = target[idx[keep]]
        if method == "point_to_plane":
            delta = _point_to_plane_step(
                src_k, dst_k, target_normals[idx[keep]], w
            )
        else:
            delta = _best_rigid_transform(src_k, dst_k, w)
        transform = delta @ transform
        cur = source @ transform[:3, :3].T + transform[:3, 3]
        rmse = float(np.sqrt((dist[keep] ** 2).mean()))
        if abs(prev_rmse - rmse) < tolerance:
            break
        prev_rmse = rmse
    # Report residuals OF THE RETURNED transform (the loop's rmse is one
    # update stale — it was measured before the final delta).
    dist, _ = tree.query(cur, k=1, workers=-1)
    keep = dist < max_correspondence_distance
    if keep.any():
        rmse = float(np.sqrt((dist[keep] ** 2).mean()))
    return transform, rmse


def load_icp_json(path: Path) -> np.ndarray:
    """Read the reference's icp_{mode}.json -> (4, 4) transform
    (dn_pipeline.py:368-371)."""
    data = json.load(open(path))
    return np.array(data["gt_transformation"], np.float64).reshape(4, 4)


def save_icp_json(path: Path, transform: np.ndarray) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    json.dump(
        {"gt_transformation": np.asarray(transform).reshape(-1).tolist()},
        open(path, "w"),
    )


def transform_points(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    return points @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
