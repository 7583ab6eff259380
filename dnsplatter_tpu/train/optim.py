"""Per-parameter-group Adam with the reference's learning rates.

The reference uses 7 nerfstudio Adam groups (dn_config.py:29-68):
means 1.6e-4 (exp decay to 1.6e-6 over 30k), features_dc 2.5e-3,
features_rest 2.5e-3/20, opacities 5e-2, scales 5e-3, quats 1e-3,
normals 1e-3, all eps=1e-15. Implemented directly (not via optax
multi_transform) because densification performs *state surgery* — zeroing
first/second moments of split/duplicated/reset Gaussians
(dn_model.py:335-338, 365-382) — which is a one-line scatter when the
moments live in a GaussianParams-shaped pytree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.models.gaussians import GaussianParams


class AdamState(NamedTuple):
    mu: GaussianParams  # first moments, same pytree as params
    nu: GaussianParams  # second moments
    count: jax.Array  # () int32 step counter


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr_means: float = 1.6e-4
    lr_means_final: float = 1.6e-6
    lr_features_dc: float = 2.5e-3
    lr_features_rest: float = 2.5e-3 / 20.0
    lr_opacities: float = 5e-2
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_normals: float = 1e-3
    max_steps: int = 30000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def lr_tree(cfg: OptimConfig, step: jax.Array) -> GaussianParams:
    """Per-field learning rates; means follow the exponential decay
    schedule lr = lr0 * (lr_final/lr0)^(step/max_steps) (nerfstudio
    ExponentialDecayScheduler, dn_config.py:31-34)."""
    frac = jnp.clip(step.astype(jnp.float32) / cfg.max_steps, 0.0, 1.0)
    lr_means = cfg.lr_means * (cfg.lr_means_final / cfg.lr_means) ** frac
    return GaussianParams(
        means=lr_means,
        scales=jnp.asarray(cfg.lr_scales),
        quats=jnp.asarray(cfg.lr_quats),
        features_dc=jnp.asarray(cfg.lr_features_dc),
        features_rest=jnp.asarray(cfg.lr_features_rest),
        opacities=jnp.asarray(cfg.lr_opacities),
        normals=jnp.asarray(cfg.lr_normals),
    )


def adam_step(
    cfg: OptimConfig,
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    step: jax.Array,
) -> tuple[GaussianParams, AdamState]:
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - cfg.b1**cf
    bc2 = 1.0 - cfg.b2**cf
    lrs = lr_tree(cfg, step)

    new_m = jax.tree.map(
        lambda m, g: cfg.b1 * m + (1.0 - cfg.b1) * g, state.mu, grads
    )
    new_v = jax.tree.map(
        lambda v, g: cfg.b2 * v + (1.0 - cfg.b2) * g * g, state.nu, grads
    )
    new_p = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps),
        params, new_m, new_v, lrs,
    )
    return new_p, AdamState(mu=new_m, nu=new_v, count=count)


def zero_moments_at(state: AdamState, idx: jax.Array) -> AdamState:
    """Zero Adam moments at Gaussian slots `idx` (drop-mode scatter) — the
    densification optimizer surgery (dn_model.py:365-382)."""
    def z(x):
        zeros = jnp.zeros((idx.shape[0],) + x.shape[1:], x.dtype)
        return x.at[idx].set(zeros, mode="drop")

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
        count=state.count,
    )


def zero_moments_field(state: AdamState, field: str) -> AdamState:
    """Zero ALL moments of one field (opacity-reset surgery,
    dn_model.py:375-382)."""
    mu = dataclasses.replace(
        state.mu, **{field: jnp.zeros_like(getattr(state.mu, field))}
    )
    nu = dataclasses.replace(
        state.nu, **{field: jnp.zeros_like(getattr(state.nu, field))}
    )
    return AdamState(mu=mu, nu=nu, count=state.count)
