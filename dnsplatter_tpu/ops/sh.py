"""Spherical-harmonic color evaluation (degrees 0..4), pure JAX.

Evaluates view-dependent Gaussian colors from SH coefficients using the
standard real-SH basis and layout of the 3DGS family (parity target: gsplat
`spherical_harmonics` / `num_sh_bases`, used at dn_splatter/dn_model.py:35,
495-516). The whole evaluation is a (N, K) basis times (N, K, 3) coeff
contraction — MXU-friendly and trivially batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    """Number of SH bases for a given degree (parity: gsplat num_sh_bases)."""
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jax.Array) -> jax.Array:
    """Real SH basis values for unit directions.

    Args:
        degree: max SH degree in [0, 4].
        dirs: (..., 3) unit view directions.

    Returns:
        (..., (degree+1)**2) basis values.
    """
    if not 0 <= degree <= 4:
        raise ValueError(f"SH degree {degree} not in [0, 4]")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, coeffs: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH colors.

    Args:
        degree: active SH degree (coeffs beyond it are ignored, matching
            gsplat's `sh_degree_to_use` schedule, dn_model.py:487-493).
        coeffs: (..., K, 3) SH coefficients with K >= (degree+1)**2.
        dirs: (..., 3) directions (normalized internally).

    Returns:
        (..., 3) colors, offset by +0.5 and clamped to >= 0 (3DGS/gsplat
        convention).
    """
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    basis = sh_basis(degree, dirs)  # (..., B)
    nb = basis.shape[-1]
    # Unrolled contraction instead of an einsum: a batched (N, K, 3)
    # dot_general operand takes a T(4,128)-tiled layout on TPU (~57x
    # padding; measured ~31 ms/step at 2M capacity for degree 1,
    # perf/tpu_train_1m_diag.py) — per-k slices stay fused elementwise.
    colors = sum(
        basis[..., k:k + 1] * coeffs[..., k, :] for k in range(nb)
    )
    return jnp.maximum(colors + 0.5, 0.0)


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """Inverse of the DC term mapping: sh0 = (rgb - 0.5) / C0.

    Parity: nerfstudio splatfacto RGB2SH (used at dn_model.py:145).
    """
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """DC-term SH -> rgb (SH2RGB)."""
    return sh * C0 + 0.5
