"""Camera pose optimizer (SO3xR3), parity with nerfstudio's
CameraOptimizer used by the reference (dn_model.py:422
`camera_optimizer.apply_to_camera`; config `mode="off"` by default,
dn_model.py:116-118, lr 1e-3 -> 5e-5, dn_config.py:57-61).

A per-camera 6-vector tangent [rho(3), phi(3)] maps to an SE(3)
adjustment right-multiplied onto the camera-to-world matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dnsplatter_tpu.ops.camera import Camera


def so3_exp(phi: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues exponential map: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    theta_safe = jnp.maximum(theta, eps)
    axis = phi / theta_safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    k = jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    rot = eye + s * k + (1.0 - c) * (k @ k)
    # Near zero: first-order I + K.
    small = (theta < eps)[..., None]
    return jnp.where(small, eye + k, rot)


def exp_map_so3xr3(tangent: jax.Array) -> jax.Array:
    """(..., 6) [rho, phi] -> (..., 4, 4) adjustment (decoupled
    translation, like nerfstudio's SO3xR3 mode)."""
    rho = tangent[..., :3]
    rot = so3_exp(tangent[..., 3:])
    top = jnp.concatenate([rot, rho[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], tangent.dtype),
        tangent.shape[:-1] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def apply_adjustment(camera: Camera, tangent6: jax.Array) -> Camera:
    """Right-multiply the exp-map adjustment onto the OpenGL c2w."""
    adj = exp_map_so3xr3(tangent6)
    import dataclasses

    return dataclasses.replace(camera, c2w=camera.c2w @ adj)
