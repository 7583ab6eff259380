"""Gaussian parameter state: padded capacity arrays + alive mask.

The reference stores a variable-length `gauss_params` ParameterDict of 7
tensors that physically grows/shrinks at every densify/cull
(dn_splatter/dn_model.py:131-265, 271-386). XLA wants static shapes, so
here the state is a fixed-capacity pytree with an `alive` mask: refinement
toggles mask bits and writes new Gaussians into free slots; shapes never
change under jit. Compaction/re-padding happens host-side only when
capacity is exhausted (a recompile boundary, rare by design).

Initialization parity (dn_model.py:131-265):
  * means from seed points (SfM / RGB-D backprojection), else uniform
    random in a 10m box x 500k (dn_model.py:135-140);
  * log-scales = log(mean 3-NN distance), isotropic (dn_model.py:186-189);
  * quats random, or normal-seeded: flattest (z) axis rotated onto the
    seed normal via minimal rotation (dn_model.py:192-225);
  * SH DC from seed RGB via rgb_to_sh, rest zero (dn_model.py:145,232-240);
  * opacities logit(0.1) (dn_model.py:250);
  * per-Gaussian `normals` parameter initialised from seed normals or the
    quat z-axis (dn_model.py:241-249).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.quat import (
    quat_to_rotmat,
    random_quats,
    rotate_vector_to_vector,
    rotmat_to_quat,
)
from dnsplatter_tpu.ops.sh import num_sh_bases, rgb_to_sh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable Gaussian state (leading dim = static capacity C).

    alive is float {0,1} (not bool) so the whole struct is a uniform
    differentiable pytree; optimizers treat it as frozen (zero lr).
    """

    means: jax.Array  # (C, 3)
    scales: jax.Array  # (C, 3) log-scales
    quats: jax.Array  # (C, 4) wxyz
    features_dc: jax.Array  # (C, 3) SH degree-0 coefficients
    features_rest: jax.Array  # (C, B-1, 3) higher SH coefficients
    opacities: jax.Array  # (C,) logits
    normals: jax.Array  # (C, 3) trainable normal parameter

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_bases(self) -> int:
        return self.features_rest.shape[1] + 1

    @property
    def sh_degree(self) -> int:
        """Degree implied by the stored bases: B = (deg+1)^2."""
        return int(round(self.sh_bases ** 0.5)) - 1

    def sh_coeffs(self) -> jax.Array:
        """(C, B, 3) concatenated SH coefficients (dn_model.py:466-468)."""
        return jnp.concatenate(
            [self.features_dc[:, None, :], self.features_rest], axis=1
        )


def knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host-side mean distance to the k nearest neighbours (scipy cKDTree).

    Parity: dn_splatter utils/knn.py / dn_model.py:186-189 (k=3). Runs once
    at init — not on the device path.
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    # k+1 because the closest hit is the point itself.
    dists, _ = tree.query(points, k=k + 1, workers=-1)
    return dists[:, 1:].mean(axis=1)


def init_from_points(
    key: jax.Array,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
    init_opacity: float = 0.1,
) -> Tuple[GaussianParams, jax.Array, jax.Array]:
    """Build GaussianParams from a seed point cloud.

    Args:
        points: (N, 3) float; colors: optional (N, 3) in [0, 1];
        normals: optional (N, 3) unit normals (enables the reference's
            normal-seeded orientation init, dn_model.py:192-225).
        capacity: padded capacity C >= N (default: next multiple of 4096
            with 2x headroom for densification).

    Returns:
        (params, alive (C,) float, n_alive () int32)
    """
    n = int(points.shape[0])
    if capacity is None:
        capacity = max(4096, int(np.ceil(2 * n / 4096) * 4096))
    if capacity < n:
        raise ValueError(f"capacity {capacity} < seed points {n}")
    b = num_sh_bases(sh_degree)

    dists = np.maximum(knn_mean_dist(points, k=3), 1e-7)
    scales_np = np.log(dists)[:, None].repeat(3, axis=1)

    key, kq = jax.random.split(key)
    if normals is not None:
        nrm = normals / np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
        )
        z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        rots = rotate_vector_to_vector(z, jnp.asarray(nrm, jnp.float32))
        quats_n = rotmat_to_quat(rots)
        # Flatten the normal-facing axis: scale_z shrunk (reference divides
        # the aligned axis, keeping the disc flat against the surface).
        scales_np[:, 2] = scales_np[:, 2] - np.log(10.0)
        normals_init = nrm.astype(np.float32)
    else:
        quats_n = random_quats(kq, n)
        rot = quat_to_rotmat(quats_n)
        normals_init = np.asarray(rot[..., :, 2])

    if colors is None:
        colors = np.random.default_rng(0).uniform(size=(n, 3))
    dc = np.asarray(rgb_to_sh(jnp.asarray(colors, jnp.float32)))

    def pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats_pad = np.zeros((capacity, 4), np.float32)
    quats_pad[:, 0] = 1.0
    quats_pad[:n] = np.asarray(quats_n)

    params = GaussianParams(
        means=pad(points),
        scales=pad(scales_np, fill=-10.0),
        quats=jnp.asarray(quats_pad),
        features_dc=pad(dc),
        features_rest=jnp.zeros((capacity, b - 1, 3), jnp.float32),
        opacities=pad(
            np.full((n,), float(np.log(init_opacity / (1 - init_opacity)))),
            fill=-15.0,
        ),
        normals=pad(normals_init),
    )
    alive = jnp.asarray(
        np.concatenate([np.ones(n), np.zeros(capacity - n)]).astype(np.float32)
    )
    return params, alive, jnp.asarray(n, jnp.int32)


def grow_capacity(
    params: GaussianParams,
    alive: jax.Array,
    new_capacity: int,
) -> Tuple[GaussianParams, jax.Array]:
    """Re-pad the state to a larger capacity (a recompile boundary).

    Every N-scale stage prices CAPACITY, not the live count (the 1M-seed
    train step measured 247 ms at 2x-padded capacity vs 153 ms right-
    sized — perf/tpu_train_1m_diag.py), so the Trainer starts tight
    (TrainConfig.capacity_margin) and grows here only when densification
    approaches the ceiling. Pad fills match init_from_points' dead-slot
    convention (identity quats, log-scale -10, opacity logit -15)."""
    c = params.capacity
    if new_capacity <= c:
        return params, alive
    pad = new_capacity - c

    def padz(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    quats_tail = jnp.zeros((pad, 4), jnp.float32).at[:, 0].set(1.0)
    params = GaussianParams(
        means=padz(params.means),
        scales=padz(params.scales, -10.0),
        quats=jnp.concatenate([params.quats, quats_tail], axis=0),
        features_dc=padz(params.features_dc),
        features_rest=padz(params.features_rest),
        opacities=padz(params.opacities, -15.0),
        normals=padz(params.normals),
    )
    return params, padz(alive)


def init_random(
    key: jax.Array,
    num_points: int = 500_000,
    extent: float = 5.0,
    sh_degree: int = 3,
    capacity: Optional[int] = None,
) -> Tuple[GaussianParams, jax.Array, jax.Array]:
    """Random fallback init: uniform in [-extent, extent]^3 (dn_model.py:135)."""
    kp, kc, kq = jax.random.split(key, 3)
    pts = np.asarray(
        jax.random.uniform(kp, (num_points, 3), minval=-extent, maxval=extent)
    )
    cols = np.asarray(jax.random.uniform(kc, (num_points, 3)))
    # pass a FRESH key: re-using `key` would make init_from_points' own
    # splits collide with kp/kc (correlated colors and quaternions)
    return init_from_points(kq, pts, cols, sh_degree=sh_degree,
                            capacity=capacity)
