"""Pose normalization: auto-orient, center, scale (numpy, host-side).

Equivalent of nerfstudio's `auto_orient_and_center_poses` +
`auto_scale_poses` used by every dataparser in the reference
(normal_nerfstudio.py:271-286). Conventions: poses are (N, 4, 4) OpenGL
camera-to-world.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def rotation_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Minimal rotation matrix taking unit vector a to unit vector b."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1.0 + 1e-8:  # antiparallel
        ortho = np.array([1.0, 0, 0]) if abs(a[0]) < 0.9 else np.array([0, 1.0, 0])
        axis = np.cross(a, ortho)
        axis /= np.linalg.norm(axis)
        return 2.0 * np.outer(axis, axis) - np.eye(3)
    k = np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64
    )
    return np.eye(3) + k + k @ k / (1.0 + c)


def auto_orient_and_center_poses(
    poses: np.ndarray,
    method: str = "up",
    center_method: str = "poses",
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (oriented poses (N,4,4), applied transform (3,4))."""
    poses = np.asarray(poses, np.float64)
    origins = poses[:, :3, 3]

    if center_method == "poses":
        translation = origins.mean(axis=0)
    elif center_method == "focus":
        translation = origins.mean(axis=0)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(center_method)

    if method == "up":
        up = poses[:, :3, 1].mean(axis=0)
        up /= np.linalg.norm(up)
        rot = rotation_between(up, np.array([0.0, 0.0, 1.0]))
    elif method == "none":
        rot = np.eye(3)
    else:
        raise ValueError(method)

    transform = np.concatenate([rot, rot @ -translation[:, None]], axis=1)
    full = np.concatenate([transform, [[0, 0, 0, 1]]], axis=0)
    oriented = np.einsum("ij,njk->nik", full, poses)
    return oriented.astype(np.float32), transform.astype(np.float32)


def auto_scale(poses: np.ndarray, extra_scale: float = 1.0) -> Tuple[np.ndarray, float]:
    """Scale so the max |translation| is 1 (nerfstudio auto_scale_poses)."""
    s = 1.0 / max(float(np.max(np.abs(poses[:, :3, 3]))), 1e-8)
    s *= extra_scale
    poses = poses.copy()
    poses[:, :3, 3] *= s
    return poses, s


def apply_transform_to_points(points: np.ndarray, transform: np.ndarray,
                              scale: float) -> np.ndarray:
    """Apply the (3,4) dataparser transform + scale to world points."""
    return (points @ transform[:3, :3].T + transform[:3, 3]) * scale
