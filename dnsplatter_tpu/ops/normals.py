"""Normal-map utilities: depth-gradient surface normals, per-Gaussian
normals, and frame conversions (pure JAX).

Parity targets:
  - dn_splatter/utils/normal_utils.py:9-48 (`pcd_to_normal`,
    `normal_from_depth_image`)
  - dn_splatter/dn_model.py:542-556 (per-Gaussian normal = rotated
    min-scale axis, sign-flipped toward the camera)
  - dn_splatter/dn_model.py:585-603 (surface normal output convention:
    camera-space backprojection, then diag(1,-1,-1) flip, then (n+1)/2)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dnsplatter_tpu.ops.camera import backproject_depth
from dnsplatter_tpu.ops.quat import quat_rotate, quat_to_rotmat


def pcd_to_normal(xyz: jax.Array) -> jax.Array:
    """Central-difference cross-product normals from an (H, W, 3) point map.

    Interior normals are normalize(cross(right-left, top-bottom)); the
    one-pixel border is zero (reference pads with zeros,
    normal_utils.py:19-21).
    """
    top = xyz[:-2, 1:-1, :]
    bottom = xyz[2:, 1:-1, :]
    left = xyz[1:-1, :-2, :]
    right = xyz[1:-1, 2:, :]
    n = jnp.cross(right - left, top - bottom)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def normal_from_depth_image(
    depth: jax.Array,
    fx,
    fy,
    cx,
    cy,
    c2w: Optional[jax.Array] = None,
) -> jax.Array:
    """Estimate normals from a z-depth map by backprojection + cross product.

    Returns (H, W, 3) unit normals (zero border). With c2w=None the normals
    are in the OpenCV camera frame, matching the model's usage with an
    identity c2w (dn_model.py:589-599).
    """
    pts = backproject_depth(depth, fx, fy, cx, cy, c2w=c2w)
    return pcd_to_normal(pts)


def surface_normal_output(depth: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """The model's `surface_normal` output head.

    Camera-frame depth normals, flipped with diag(1, -1, -1) (OpenCV -> the
    reference's OpenGL-ish display frame) and mapped to [0, 1].
    Parity: dn_model.py:585-603.
    """
    n = normal_from_depth_image(depth, fx, fy, cx, cy)
    n = n * jnp.array([1.0, -1.0, -1.0], dtype=n.dtype)
    return (1.0 + n) * 0.5


def per_gaussian_normals(
    scales_log: jax.Array,
    quats: jax.Array,
    means: jax.Array,
    cam_pos: jax.Array,
) -> jax.Array:
    """World-space per-Gaussian normals.

    The normal of a Gaussian is its flattest axis (argmin of scale) rotated
    by its orientation, sign-flipped to face the camera.
    Parity: dn_model.py:543-556. The argmin one-hot is built arithmetically
    (no gather) so it vectorizes cleanly on the VPU.
    """
    # one-hot of argmin over the 3 scales (ties broken toward lower index,
    # like torch.argmin).
    s = scales_log
    idx = jnp.argmin(s, axis=-1)
    onehot = jax.nn.one_hot(idx, 3, dtype=s.dtype)
    # quat_rotate keeps this elementwise — an (N, 3, 3) rotmat einsum
    # materializes T(4,128)-padded operands (~57x) in the train step.
    normals = quat_rotate(quats, onehot)
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    viewdirs = cam_pos - jax.lax.stop_gradient(means)
    viewdirs = viewdirs / jnp.maximum(
        jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12
    )
    dots = jnp.sum(normals * viewdirs, axis=-1, keepdims=True)
    return jnp.where(dots < 0.0, -normals, normals)


def world_to_camera_normals(normals: jax.Array, c2w: jax.Array) -> jax.Array:
    """Rotate world normals into the (OpenGL) camera frame.

    Parity: dn_model.py:560 `normals @ c2w[:3, :3]` — i.e. R^T n, components
    along the OpenGL camera axes. Expanded with scalar weights instead of
    a matmul: an (N, 3) dot_general operand takes a row-major T(8,128)
    layout (~43x padding, ~1 GB at 2M capacity) and its transposed VJP
    runs whenever the normal loss is on (~34 ms/step at 2M,
    perf/tpu_train_1m_diag.py).
    """
    r = c2w[:3, :3]
    return jnp.stack(
        [normals[..., 0] * r[0, i] + normals[..., 1] * r[1, i]
         + normals[..., 2] * r[2, i] for i in range(3)],
        axis=-1,
    )
