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
    count: GaussianParams  # per-field () int32 apply counters
    accum: GaussianParams  # per-field gradient accumulators


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
    # per-group gradient accumulation: the reference steps the "color"
    # (features_dc) and "shs" (features_rest) Adam groups only every 10
    # iterations with summed gradients (dn_config.py:22).
    accum_features_dc: int = 10
    accum_features_rest: int = 10
    # camera-optimizer group (reference dn_config.py:57-61 + the
    # camera_opt entry of gradient_accumulation_steps, dn_config.py:22):
    # SE(3) tangents, Adam lr 1e-3 -> 5e-5 exp decay over max_steps,
    # gradients accumulated over 100 steps per apply.
    lr_camera_opt: float = 1e-3
    lr_camera_opt_final: float = 5e-5
    accum_camera_opt: int = 100

    def accum_steps(self) -> GaussianParams:
        """Per-field accumulation windows as a GaussianParams of ints."""
        return GaussianParams(
            means=1, scales=1, quats=1,
            features_dc=self.accum_features_dc,
            features_rest=self.accum_features_rest,
            opacities=1, normals=1,
        )


def init_adam(params: GaussianParams) -> AdamState:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    counts = jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params)
    return AdamState(mu=zeros(), nu=zeros(), count=counts, accum=zeros())


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
    """Adam with per-field gradient accumulation.

    Fields with window N accumulate gradients and apply one Adam update
    (with its own bias-correction counter) every Nth call; N=1 fields
    behave like plain Adam.
    """
    lrs = lr_tree(cfg, step)
    windows = cfg.accum_steps()

    def upd(p, g, m, v, cnt, acc, lr, n):
        acc = acc + g
        apply = ((step + 1) % n == 0) if n > 1 else jnp.bool_(True)
        cnt_new = jnp.where(apply, cnt + 1, cnt)
        cf = jnp.maximum(cnt_new.astype(jnp.float32), 1.0)
        bc1 = 1.0 - cfg.b1**cf
        bc2 = 1.0 - cfg.b2**cf
        m_new = jnp.where(apply, cfg.b1 * m + (1.0 - cfg.b1) * acc, m)
        v_new = jnp.where(apply, cfg.b2 * v + (1.0 - cfg.b2) * acc * acc, v)
        p_new = jnp.where(
            apply,
            p - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps),
            p,
        )
        acc_new = jnp.where(apply, jnp.zeros_like(acc), acc)
        return p_new, m_new, v_new, cnt_new, acc_new

    fields = list(GaussianParams.__dataclass_fields__)
    outs = {}
    for f in fields:
        outs[f] = upd(
            getattr(params, f), getattr(grads, f), getattr(state.mu, f),
            getattr(state.nu, f), getattr(state.count, f),
            getattr(state.accum, f), getattr(lrs, f),
            getattr(windows, f),
        )
    new_p = GaussianParams(**{f: outs[f][0] for f in fields})
    new_m = GaussianParams(**{f: outs[f][1] for f in fields})
    new_v = GaussianParams(**{f: outs[f][2] for f in fields})
    new_c = GaussianParams(**{f: outs[f][3] for f in fields})
    new_a = GaussianParams(**{f: outs[f][4] for f in fields})
    return new_p, AdamState(mu=new_m, nu=new_v, count=new_c, accum=new_a)


def zero_moments_at(state: AdamState, idx: jax.Array) -> AdamState:
    """Zero Adam moments (and pending accumulators) at Gaussian slots
    `idx` (drop-mode scatter) — the densification optimizer surgery
    (dn_model.py:365-382)."""
    def z(x):
        zeros = jnp.zeros((idx.shape[0],) + x.shape[1:], x.dtype)
        return x.at[idx].set(zeros, mode="drop")

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
        count=state.count, accum=jax.tree.map(z, state.accum),
    )


def zero_moments_field(state: AdamState, field: str) -> AdamState:
    """Zero ALL moments of one field (opacity-reset surgery,
    dn_model.py:375-382)."""
    def zf(tree):
        return dataclasses.replace(
            tree, **{field: jnp.zeros_like(getattr(tree, field))}
        )

    return AdamState(mu=zf(state.mu), nu=zf(state.nu), count=state.count,
                     accum=zf(state.accum))


class CamOptState(NamedTuple):
    """Device-side camera-pose optimizer state (SO3xR3 tangents + Adam).

    Lives entirely inside the jitted train step so pose optimization
    composes with multi-step dispatch (lax.scan) and multi-process data
    parallelism (the state is replicated; updates are deterministic).
    Reference: nerfstudio CameraOptimizer + dn_config.py:22,57-61.
    """

    adj: jax.Array    # (n_cams, 6) SE(3) tangents
    accum: jax.Array  # (n_cams, 6) pending gradient accumulation
    mu: jax.Array     # (n_cams, 6) Adam first moments
    nu: jax.Array     # (n_cams, 6) Adam second moments
    count: jax.Array  # () int32 applied-update counter (bias correction)


def init_cam_opt(n_cams: int) -> CamOptState:
    n = max(n_cams, 1)
    z = jnp.zeros((n, 6), jnp.float32)
    return CamOptState(adj=z, accum=z, mu=z, nu=z,
                       count=jnp.zeros((), jnp.int32))


def cam_opt_update(
    cfg: OptimConfig,
    state: CamOptState,
    cam_i: jax.Array,   # () int32 — this step's camera index
    gadj: jax.Array,    # (6,) pose-tangent gradient from the step
    step: jax.Array,    # () int32 — trainer step (pre-increment)
) -> CamOptState:
    """Accumulate this step's pose gradient and, every
    `accum_camera_opt`-th step, apply one full-array Adam update with the
    exponential lr schedule lr0 -> lr_final over max_steps
    (dn_config.py:57-61). Matches plain Adam on the accumulated sums;
    rows without gradients still decay their moments (same as the
    reference's single optimizer over the stacked tangents)."""
    accum = state.accum.at[cam_i].add(gadj)

    def apply(acc):
        count = state.count + 1
        mu = cfg.b1 * state.mu + (1.0 - cfg.b1) * acc
        nu = cfg.b2 * state.nu + (1.0 - cfg.b2) * acc * acc
        cf = count.astype(jnp.float32)
        mhat = mu / (1.0 - cfg.b1 ** cf)
        vhat = nu / (1.0 - cfg.b2 ** cf)
        frac = jnp.clip(step.astype(jnp.float32) / cfg.max_steps, 0.0, 1.0)
        lr = cfg.lr_camera_opt * (
            cfg.lr_camera_opt_final / cfg.lr_camera_opt
        ) ** frac
        adj = state.adj - lr * mhat / (jnp.sqrt(vhat) + cfg.eps)
        return CamOptState(adj=adj, accum=jnp.zeros_like(acc), mu=mu,
                           nu=nu, count=count)

    return jax.lax.cond(
        (step + 1) % cfg.accum_camera_opt == 0,
        apply,
        lambda acc: state._replace(accum=acc),
        accum,
    )
