"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

Implements the same math as gsplat's `fully_fused_projection` (the first
stage of `gsplat.rendering.rasterization`, called at
dn_splatter/dn_model.py:495-516): world->camera transform, 3D covariance
from quat/scale, perspective Jacobian with frustum-clamped tangents, 2D
covariance with the +0.3 px low-pass blur, conic inversion, 3-sigma radius,
and the antialiasing opacity compensation.

Everything is elementwise over N Gaussians — XLA maps it straight onto the
VPU; no kernel needed. Gradients come from JAX autodiff (the projection is
a tiny fraction of the FLOPs; the hot path is the rasterizer).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.ops.quat import quat_normalize, quat_to_rotmat


class Projected(NamedTuple):
    """Screen-space Gaussians.

    means2d: (N, 2) pixel coordinates of the projected centers.
    depths: (N,) camera-frame z-depth.
    conics: (N, 3) upper-triangular inverse 2D covariance (a, b, c) such
        that sigma(d) = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy.
    radii: (N,) integer-valued 3-sigma screen radius (0 => culled).
    compensations: (N,) antialiasing opacity scale sqrt(det/det_blurred).
    valid: (N,) bool — inside the frustum and numerically sound.
    """

    means2d: jax.Array
    depths: jax.Array
    conics: jax.Array
    radii: jax.Array
    radii_xy: jax.Array  # (N, 2) per-axis tight AABB extents of the ellipse
    compensations: jax.Array
    valid: jax.Array


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """(N, 3, 3) world covariance = R diag(s^2) R^T from wxyz quats and
    linear (already exp'ed) scales."""
    rot = quat_to_rotmat(quats)  # (N, 3, 3)
    m = rot * scales[..., None, :]  # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)


def _camera_cov_components(quats, scales, rot_wc):
    """The 6 unique entries of W (R S)(R S)^T W^T as (N,) arrays.

    Fully component-wise on purpose: (N, 3, 3) temporaries tile as
    T(4, 128) on TPU — a 56.9x padding expansion that costs 3.8 GB per
    temporary at N=2M capacity and OOMs the 1M-seed train step compile
    (three such buffers appear in the einsum formulation's transposed
    autodiff). Scalar-weighted (N,) math keeps both the primal and the
    VJP elementwise."""
    q = quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )
    s = (scales[..., 0], scales[..., 1], scales[..., 2])
    # 0-d slices (viewmat may be traced — e.g. under camera-pose opt)
    ww = [[rot_wc[i, k] for k in range(3)] for i in range(3)]
    # b[i][j] = sum_k W_ik R_kj s_j  (W entries are camera scalars)
    b = [
        [
            (ww[i][0] * r[0][j] + ww[i][1] * r[1][j] + ww[i][2] * r[2][j])
            * s[j]
            for j in range(3)
        ]
        for i in range(3)
    ]

    def dot(i, l):
        return b[i][0] * b[l][0] + b[i][1] * b[l][1] + b[i][2] * b[l][2]

    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


def project_gaussians(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    viewmat: jax.Array,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    opacities: jax.Array | None = None,
) -> Projected:
    """Project N world-space Gaussians into one camera (OpenCV viewmat).

    Mirrors gsplat's fused projection semantics:
      * camera-space means `t = R_wc x + t_wc`; cull outside (near, far);
      * perspective Jacobian evaluated at tangent-clamped (tx/tz, ty/tz)
        with limits 1.3 * tan(fov/2) to stabilize off-screen Gaussians;
      * cov2d = J W cov3d W^T J^T + eps2d * I;
      * compensation = sqrt(det(cov2d - eps2d I) / det(cov2d));
      * radius = ceil(3 * sqrt(max eigenvalue)); cull radius<=radius_clip
        and centers whose bounding box misses the image entirely.

    When `opacities` (post-sigmoid, (N,)) is given, the screen radius is
    tightened LOSSLESSLY from 3 sigma to the exact support of
    alpha >= 1/255: alpha = op * exp(-sigma) >= 1/255 iff
    sigma <= log(255 * op), and the {sigma <= s} ellipse has max extent
    sqrt(2 s lambda_max). Pixels between that radius and 3 sigma have
    alpha < 1/255 and are skipped by the compositor anyway, so renders
    are bit-identical while low-opacity Gaussians touch far fewer tiles
    (gsplat uses the fixed 3-sigma bound; this is strictly tighter for
    op < exp(4.5)/255 ~= 0.35, and capped at 3 sigma above).
    """
    rot_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]
    mean_c = means @ rot_wc.T + t_wc  # (N, 3)
    tz = mean_c[..., 2]

    c00, c01, c02, c11, c12, c22 = _camera_cov_components(
        quats, scales, rot_wc
    )

    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    txz = jnp.clip(mean_c[..., 0] / tz_safe, -lim_x, lim_x) * tz_safe
    tyz = jnp.clip(mean_c[..., 1] / tz_safe, -lim_y, lim_y) * tz_safe

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]
    j00 = fx * rz
    j02 = -fx * txz * rz2
    j11 = fy * rz
    j12 = -fy * tyz * rz2

    # cov2d = J Sigma J^T, expanded by hand (keeps it on the VPU, no 3x3
    # batched matmuls for a 2x2 result).
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = a * c - b * b
    a_b = a + eps2d
    c_b = c + eps2d
    det = a_b * c_b - b * b
    det_safe = jnp.where(det <= 0.0, 1e-12, det)
    compensations = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    conic = jnp.stack([c_b / det_safe, -b / det_safe, a_b / det_safe], axis=-1)

    mid = 0.5 * (a_b + c_b)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    vmax = mid + disc
    sigma_bound = 4.5  # (3 sigma)^2 / 2
    if opacities is not None:
        op = jax.lax.stop_gradient(opacities)
        sigma_bound = jnp.minimum(
            jnp.log(jnp.maximum(255.0 * op, 1e-12)), 4.5
        )
    sb = jnp.maximum(sigma_bound, 0.0)
    radius = jnp.ceil(jnp.sqrt(2.0 * sb * jnp.maximum(vmax, 0.0)))
    # Tight per-axis AABB of the {sigma <= bound} ellipse: its x/y extents
    # are sqrt(2 s Sigma_xx/yy) — for anisotropic splats this bounds far
    # fewer tiles than the max-eigenvalue circle, with identical renders
    # (every pixel with alpha >= 1/255 stays inside the box).
    rx = jnp.ceil(jnp.sqrt(2.0 * sb * jnp.maximum(a_b, 0.0)))
    ry = jnp.ceil(jnp.sqrt(2.0 * sb * jnp.maximum(c_b, 0.0)))

    mean2d = jnp.stack(
        [fx * mean_c[..., 0] * rz + cx, fy * mean_c[..., 1] * rz + cy], axis=-1
    )

    inside_depth = (tz > near_plane) & (tz < far_plane)
    pos_det = det > 0.0
    on_image = (
        (mean2d[..., 0] + rx > 0)
        & (mean2d[..., 0] - rx < width)
        & (mean2d[..., 1] + ry > 0)
        & (mean2d[..., 1] - ry < height)
    )
    valid = inside_depth & pos_det & (radius > radius_clip) & on_image
    radii = jnp.where(valid, radius, 0.0)
    radii_xy = jnp.where(valid[:, None], jnp.stack([rx, ry], -1), 0.0)

    return Projected(
        means2d=mean2d,
        depths=tz,
        conics=conic,
        radii=radii,
        radii_xy=radii_xy,
        compensations=compensations,
        valid=valid,
    )
