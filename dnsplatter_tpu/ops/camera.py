"""Camera model and projection utilities (pure JAX).

Conventions (encoded once here; the reference scatters them across
nerfstudio + dn_splatter/utils/camera_utils.py — see that file's
OPENGL_TO_OPENCV at line 11):

  * `c2w` (camera-to-world) is stored in the OpenGL/nerfstudio convention:
    +X right, +Y up, -Z forward (viewing direction).
  * Rendering happens in the OpenCV convention: +X right, +Y down,
    +Z forward. `viewmat()` returns the OpenCV world-to-camera matrix,
    matching nerfstudio splatfacto's `get_viewmat` (dn_model.py:475).
  * Pixel centers are at integer + 0.5 (camera_utils.py:70-89).
  * Depth maps are z-depth (distance along camera +Z), not euclidean ray
    length; `euclidean_to_z_depth` converts (camera_utils.py:34-67).

Width/height are static Python ints so every jitted consumer sees static
shapes (XLA requirement).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Right-multiply a c2w by this to flip OpenGL <-> OpenCV camera axes.
# numpy on purpose: a module-level jnp array would initialize the JAX
# backend at import time — too early for jax.distributed.initialize on
# multi-host launches.
GL_TO_CV = np.diag(np.array([1.0, -1.0, -1.0, 1.0], np.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera.

    Attributes:
        fx, fy, cx, cy: intrinsics (scalar arrays; traced under jit).
        c2w: (4, 4) camera-to-world, OpenGL convention (nerfstudio).
        width, height: static image size in pixels.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    c2w: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(fx, fy, cx, cy, c2w, width: int, height: int) -> "Camera":
        c2w = jnp.asarray(c2w, jnp.float32)
        if c2w.shape == (3, 4):
            c2w = jnp.concatenate(
                [c2w, jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
            )
        return Camera(
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32),
            cy=jnp.asarray(cy, jnp.float32),
            c2w=c2w,
            width=int(width),
            height=int(height),
        )

    @property
    def K(self) -> jax.Array:
        """(3, 3) intrinsics matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def viewmat(self) -> jax.Array:
        """(4, 4) OpenCV world-to-camera matrix.

        Equivalent to splatfacto `get_viewmat(c2w)`: flip y/z columns of the
        OpenGL c2w, then invert the rigid transform analytically.
        """
        c2w_cv = self.c2w @ GL_TO_CV
        rot = c2w_cv[:3, :3]
        t = c2w_cv[:3, 3]
        rot_inv = rot.T
        t_inv = -rot_inv @ t
        top = jnp.concatenate([rot_inv, t_inv[:, None]], axis=1)
        bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
        return jnp.concatenate([top, bottom], axis=0)

    def position(self) -> jax.Array:
        """(3,) camera origin in world coordinates."""
        return self.c2w[:3, 3]

    def rescaled(self, factor: float) -> "Camera":
        """Return a camera with output resolution scaled by `factor`."""
        return Camera(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            c2w=self.c2w,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )


def pixel_coords(width: int, height: int, pixel_offset: float = 0.5) -> jax.Array:
    """(H, W, 2) pixel-center coordinates stored as (x, y).

    Parity: camera_utils.py:70-89 `get_camera_coords` (which returns the
    flattened version; callers reshape).
    """
    xs = jnp.arange(width, dtype=jnp.float32) + pixel_offset
    ys = jnp.arange(height, dtype=jnp.float32) + pixel_offset
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([xg, yg], axis=-1)


def backproject_depth(
    depth: jax.Array,
    fx,
    fy,
    cx,
    cy,
    c2w: Optional[jax.Array] = None,
) -> jax.Array:
    """Backproject a z-depth map to 3D points.

    Args:
        depth: (H, W) or (H, W, 1) z-depths in the OpenCV camera frame.
        c2w: optional (4, 4) OpenCV-convention camera-to-world. If None the
            points stay in the camera frame.

    Returns:
        (H, W, 3) points.

    Parity: camera_utils.py:92-144 `get_means3d_backproj` (note the
    reference multiplies by inv(R) on the right, i.e. p_w = p_c @ R^{-1} + t
    which equals R @ p_c + t for rotations — we use the direct form).
    """
    if depth.ndim == 3:
        depth = depth[..., 0]
    h, w = depth.shape
    coords = pixel_coords(w, h)
    x = (coords[..., 0] - cx) * depth / fx
    y = (coords[..., 1] - cy) * depth / fy
    pts = jnp.stack([x, y, depth], axis=-1)
    if c2w is not None:
        rot = c2w[:3, :3]
        # rotation inverse == transpose (a general LU inverse costs more
        # and adds rounding): p_w = p_c @ R^{-1} = p_c @ R^T (row vectors)
        pts = pts @ rot.T + c2w[:3, 3]
    return pts


def project_points(
    points: jax.Array,
    fx,
    fy,
    cx,
    cy,
    c2w: Optional[jax.Array] = None,
    return_z: bool = False,
) -> jax.Array:
    """Project world points to pixel (u, v) [and optionally z-depth].

    Parity: camera_utils.py:147-172 `project_pix` — note the reference
    transforms with (p - t) @ R, i.e. R^T (p - t), the rigid inverse.
    """
    if c2w is not None:
        pts_cam = (points - c2w[:3, 3]) @ c2w[:3, :3]
    else:
        pts_cam = points
    z = pts_cam[..., 2]
    u = pts_cam[..., 0] * fx / z + cx
    v = pts_cam[..., 1] * fy / z + cy
    if return_z:
        return jnp.stack([u, v, z], axis=-1)
    return jnp.stack([u, v], axis=-1)


def euclidean_to_z_depth(depth: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """Convert euclidean (ray-length) depth to z-depth.

    Parity: camera_utils.py:34-67.
    """
    if depth.ndim == 3:
        depth = depth[..., 0]
    h, w = depth.shape
    coords = pixel_coords(w, h)
    x = (coords[..., 0] - cx) / fx
    y = (coords[..., 1] - cy) / fy
    inv_norm = jax.lax.rsqrt(x * x + y * y + 1.0)
    return (depth * inv_norm)[..., None]


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jax.Array:
    """Build an OpenGL-convention c2w looking from `eye` at `target`.

    Convenience for synthetic test scenes (no reference equivalent).
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    # OpenGL camera: x=right, y=up, z=-forward.
    rot = jnp.stack([right, true_up, -fwd], axis=-1)
    c2w = jnp.concatenate([rot, eye[:, None]], axis=1)
    return jnp.concatenate(
        [c2w, jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
    )
