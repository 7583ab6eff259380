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


def so3_exp(phi: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rodrigues exponential map: (..., 3) -> (..., 3, 3).

    Written in the NaN-free form R = I + a*S + b*S^2 with S = skew(phi)
    UN-normalized and a = sin(t)/t, b = (1-cos(t))/t^2 switched to their
    Taylor series near zero: the double-where guards both the value AND
    the gradient at phi = 0 (jnp.linalg.norm has a NaN gradient there,
    and the trainer initializes camera tangents at exactly zero)."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(x)
    s_mat = jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))
    t2 = jnp.sum(phi * phi, axis=-1)  # theta^2 (smooth at 0)
    small = t2 < eps
    # where-guard the sqrt input so the non-taken branch never sees 0
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / t2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), s_mat.shape)
    return (eye + a[..., None, None] * s_mat
            + b[..., None, None] * (s_mat @ s_mat))


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
