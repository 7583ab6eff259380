"""ADC refinement strategy (densify / duplicate / cull / opacity reset).

Splatfacto's strategy as inherited + extended by the reference
(dn_model.py:271-386), re-designed for static XLA shapes: the Gaussian
state lives in fixed-capacity arrays with an `alive` mask, and refinement
is a set of jitted scatter transforms:

  * screen-space gradient stats accumulate every step from the rasterizer's
    gradient sinks (absgrad, dn_model.py:506,517-519);
  * split: high-grad large Gaussians spawn `n_split_samples` children
    sampled from their own ellipsoid, scales /1.6, originals culled;
  * duplicate: high-grad small Gaussians copied once;
  * cull: low opacity, oversized (world or screen) Gaussians die;
  * opacity reset: logits clamped to logit(2 * cull_alpha_thresh) with
    Adam-moment zeroing for the opacities group.

New Gaussians are written into dead slots via rank-compaction
(cumsum of selection masks indexing an argsort-by-alive free list) with
drop-mode scatters — capacity overflow degrades by dropping extra children
rather than erroring. The *cadence* logic (which refinement action fires at
which step, dn_model.py:281-301) runs host-side in the trainer where `step`
is a Python int; the transforms themselves are shape-static and jitted.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.quat import quat_rotate
from dnsplatter_tpu.train.optim import AdamState, zero_moments_field


class RefineStats(NamedTuple):
    """Accumulated densification statistics (splatfacto after_train)."""

    grad_sum: jax.Array  # (C,) sum of screen-space grad norms when visible
    vis_count: jax.Array  # (C,) visibility counts
    max_2d: jax.Array  # (C,) max screen radius / max(W, H)


def init_stats(capacity: int) -> RefineStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return RefineStats(grad_sum=z, vis_count=z, max_2d=z)


def update_stats(
    stats: RefineStats,
    grad2d: jax.Array,  # (C, 2) absgrad (or plain grad) of means2d
    radii: jax.Array,  # (C,)
    valid: jax.Array,  # (C,) bool visibility this step
    max_size: float,  # max(W, H) of the rendered image
) -> RefineStats:
    gn = jnp.linalg.norm(grad2d, axis=-1)
    vis = valid.astype(jnp.float32)
    return RefineStats(
        grad_sum=stats.grad_sum + gn * vis,
        vis_count=stats.vis_count + vis,
        max_2d=jnp.maximum(stats.max_2d, jnp.where(valid, radii / max_size, 0.0)),
    )


def _free_slots(alive: jax.Array) -> jax.Array:
    """Indices of dead slots, dead-first stable order."""
    return jnp.argsort(alive, stable=True)


def _write_rows(params: GaussianParams, slots: jax.Array, rows: GaussianParams,
                ok: jax.Array) -> GaussianParams:
    """Scatter `rows` (one per source Gaussian) into `slots` where ok."""
    capacity = params.capacity
    tgt = jnp.where(ok, slots, capacity)  # OOB -> dropped

    def w(dst, src):
        return dst.at[tgt].set(src, mode="drop")

    return jax.tree.map(w, params, rows)


def densify_and_cull(
    cfg: ModelConfig,
    params: GaussianParams,
    alive: jax.Array,
    adam: AdamState,
    stats: RefineStats,
    key: jax.Array,
    step: int,
    max_size: float,
) -> Tuple[GaussianParams, jax.Array, AdamState, RefineStats]:
    """One full densify+cull event (dn_model.py:281-358). Jit-friendly;
    `step` may be static or traced (only compared, never shaped)."""
    capacity = params.capacity
    alive_b = alive > 0.5

    avg_grad = (
        stats.grad_sum / jnp.maximum(stats.vis_count, 1.0) * 0.5 * max_size
    )
    high_grads = (avg_grad > cfg.densify_grad_thresh) & alive_b
    sizes = jnp.max(jnp.exp(params.scales), axis=-1)

    splits = sizes > cfg.densify_size_thresh
    splits = splits | (
        (step < cfg.stop_screen_size_at) & (stats.max_2d > cfg.split_screen_size)
    )
    splits = splits & high_grads
    dups = (sizes <= cfg.densify_size_thresh) & high_grads

    # Cull: low alpha, plus (after the first opacity reset) world/screen
    # oversize; split originals always die.
    opac = jax.nn.sigmoid(params.opacities)
    culls = opac < cfg.cull_alpha_thresh
    after_reset = step > cfg.refine_every * cfg.reset_alpha_every
    too_big_world = sizes > cfg.cull_scale_thresh
    too_big_screen = (step < cfg.stop_screen_size_at) & (
        stats.max_2d > cfg.cull_screen_size
    )
    culls = culls | (after_reset & (too_big_world | too_big_screen))
    culls = (culls | splits) & alive_b

    alive_new = jnp.where(culls, 0.0, alive)

    free = _free_slots(alive_new)
    n_free = jnp.sum(alive_new < 0.5).astype(jnp.int32)

    # --- duplicates: one copy each ---
    dup_rank = jnp.cumsum(dups.astype(jnp.int32)) - 1
    n_dups = jnp.sum(dups.astype(jnp.int32))
    dup_ok = dups & (dup_rank < n_free)
    dup_slots = free[jnp.clip(dup_rank, 0, capacity - 1)]
    params_new = _write_rows(params, dup_slots, params, dup_ok)
    alive_new = alive_new.at[jnp.where(dup_ok, dup_slots, capacity)].set(
        1.0, mode="drop"
    )

    # --- splits: n_split_samples children sampled inside the parent ---
    split_rank = jnp.cumsum(splits.astype(jnp.int32)) - 1
    scales_lin = jnp.exp(params.scales)
    new_scales = jnp.log(scales_lin / 1.6)
    touched = [jnp.where(dup_ok, dup_slots, capacity)]
    for s in range(cfg.n_split_samples):
        key, ks = jax.random.split(key)
        eps = jax.random.normal(ks, (capacity, 3)) * scales_lin
        # elementwise rotation — the (C, 3, 3) rotmat einsum pads ~57x
        offs = quat_rotate(params.quats, eps)
        child = GaussianParams(
            means=params.means + offs,
            scales=new_scales,
            quats=params.quats,
            features_dc=params.features_dc,
            features_rest=params.features_rest,
            opacities=params.opacities,
            normals=params.normals,
        )
        slot_idx = n_dups + split_rank * cfg.n_split_samples + s
        ok = splits & (slot_idx < n_free)
        slots = free[jnp.clip(slot_idx, 0, capacity - 1)]
        params_new = _write_rows(params_new, slots, child, ok)
        alive_new = alive_new.at[jnp.where(ok, slots, capacity)].set(
            1.0, mode="drop"
        )
        touched.append(jnp.where(ok, slots, capacity))

    # Zero Adam moments for every written slot (dn_model.py:335-338) and
    # also for culled slots so stale moments never leak into revived slots.
    culled_idx = jnp.where(culls, jnp.arange(capacity), capacity)
    touched.append(culled_idx)
    all_touched = jnp.concatenate(touched)

    def zmom(x):
        zeros = jnp.zeros((all_touched.shape[0],) + x.shape[1:], x.dtype)
        return x.at[all_touched].set(zeros, mode="drop")

    adam_new = AdamState(
        mu=jax.tree.map(zmom, adam.mu),
        nu=jax.tree.map(zmom, adam.nu),
        count=adam.count,
        accum=jax.tree.map(zmom, adam.accum),
    )

    stats_new = init_stats(capacity)
    return params_new, alive_new, adam_new, stats_new


def cull_only(
    cfg: ModelConfig,
    params: GaussianParams,
    alive: jax.Array,
    adam: AdamState,
    stats: RefineStats,
    step: int,
) -> Tuple[GaussianParams, jax.Array, AdamState, RefineStats]:
    """Post-densification culling (dn_model.py:355-358)."""
    alive_b = alive > 0.5
    opac = jax.nn.sigmoid(params.opacities)
    culls = opac < cfg.cull_alpha_thresh
    sizes = jnp.max(jnp.exp(params.scales), axis=-1)
    after_reset = step > cfg.refine_every * cfg.reset_alpha_every
    too_big_screen = (step < cfg.stop_screen_size_at) & (
        stats.max_2d > cfg.cull_screen_size
    )
    culls = culls | (after_reset & ((sizes > cfg.cull_scale_thresh) | too_big_screen))
    alive_new = jnp.where(culls & alive_b, 0.0, alive)
    return params, alive_new, adam, init_stats(params.capacity)


def reset_opacity(
    cfg: ModelConfig, params: GaussianParams, adam: AdamState
) -> Tuple[GaussianParams, AdamState]:
    """Opacity reset: clamp logits to logit(2*cull_alpha_thresh), zero the
    opacities Adam moments (dn_model.py:361-382)."""
    reset_value = cfg.cull_alpha_thresh * 2.0
    max_logit = float(jnp.log(reset_value / (1.0 - reset_value)))
    params = params.__class__(
        **{
            **{f: getattr(params, f) for f in params.__dataclass_fields__},
            "opacities": jnp.minimum(params.opacities, max_logit),
        }
    )
    return params, zero_moments_field(adam, "opacities")
