"""Multi-host runtime: process bring-up, hybrid dp x gauss mesh, DP step.

The reference's multi-process story is torch DDP — one model replica per
rank, each rank training on its own image, gradients all-reduced
(dn_pipeline.py:122-128: `DDP(self._model)` + `dist.barrier` when
world_size > 1). The TPU-native equivalent (SURVEY.md §2.3):

  * `jax.distributed.initialize` brings up the multi-process runtime
    (one process per host); `init_distributed` is the single entry point
    and degenerates to a no-op in a single process.
  * ONE global 2-D device mesh `(dp, gauss)`: the `dp` axis spans hosts
    (data parallelism — each host trains on its own camera shard, like
    a DDP rank), the `gauss` axis spans the chips within a host
    (Gaussian-capacity sharding — the same layout
    `parallel/sharding.py` uses single-host). Gradient all-reduce over
    `dp` rides DCN once per step (a few hundred bytes per Gaussian
    after the in-host reduce); everything per-Gaussian stays on ICI.
  * The DP train step is a `shard_map` MANUAL over `dp` only: each dp
    group renders ITS frame with the ordinary (GSPMD-auto over `gauss`)
    model code, then `lax.pmean`s the Gaussian gradients across `dp` —
    the explicit psum the plan calls for, overlapped by XLA with the
    backward sweep. Adam applies once, outside the shard_map, on the
    averaged gradients — bitwise one optimizer step over the combined
    batch.
  * Host-local data: `host_local_indices` strides the frame list by
    process so each host loads only its shard from disk;
    `stack_frames` assembles the global (dp, ...) camera/batch arrays
    from process-local frames (`jax.make_array_from_process_local_data`
    when multi-process, plain device_put otherwise).
  * Checkpoints are process-0-gated (`is_main_process`); every process
    computes identical replicated state so no gather is needed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class DistContext:
    process_index: int
    process_count: int
    initialized: bool  # True iff jax.distributed.initialize ran

    @property
    def is_main(self) -> bool:
        return self.process_index == 0


_CONTEXT: Optional[DistContext] = None


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    require_multiprocess: bool = False,
) -> DistContext:
    """Bring up the multi-process JAX runtime (idempotent).

    Multi-process launch is requested by passing arguments, or through
    the standard environment (`JAX_COORDINATOR_ADDRESS` /
    `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`, or a cluster-env JAX
    auto-detects). With neither, this is the degenerate single-process
    path: no coordinator, process 0 of 1 — so every code path above it
    (mesh building, data sharding, checkpoint gating) is testable on
    one host.

    `require_multiprocess=True` (the CLI's `--train.distributed true`)
    always calls `jax.distributed.initialize()` — on a multi-host TPU
    pod the bare call self-detects the cluster even when none of the
    JAX_* env vars are set — and FAILS LOUDLY if bring-up still ends at
    one process, instead of silently training single-process.
    """
    global _CONTEXT
    if _CONTEXT is not None:
        return _CONTEXT
    env = os.environ
    want_multi = (
        coordinator_address is not None
        or env.get("JAX_COORDINATOR_ADDRESS")
        or (num_processes or int(env.get("JAX_NUM_PROCESSES", "1"))) > 1
        or require_multiprocess
    )
    initialized = False
    if want_multi:
        if require_multiprocess and coordinator_address is None and not (
            env.get("JAX_COORDINATOR_ADDRESS")
            or int(env.get("JAX_NUM_PROCESSES", "1")) > 1
        ):
            try:
                jax.distributed.initialize()
            except Exception as e:  # no detectable cluster: be explicit
                raise RuntimeError(
                    "--train.distributed true, but no cluster was "
                    "detected (set JAX_COORDINATOR_ADDRESS / "
                    "JAX_NUM_PROCESSES / JAX_PROCESS_ID, or launch on a "
                    "TPU pod runtime JAX can auto-detect)"
                ) from e
            if jax.process_count() == 1:
                raise RuntimeError(
                    "--train.distributed true resolved to a single "
                    "process; refusing to silently train un-distributed"
                )
            _CONTEXT = DistContext(
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                initialized=True,
            )
            return _CONTEXT
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        initialized = True
    _CONTEXT = DistContext(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        initialized=initialized,
    )
    return _CONTEXT


def dist_context() -> DistContext:
    """The active context (implicit single-process one if never init'd)."""
    if _CONTEXT is not None:
        return _CONTEXT
    return DistContext(jax.process_index(), jax.process_count(), False)


def is_main_process() -> bool:
    return dist_context().is_main


def make_hybrid_mesh(
    dp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    dp_axis: str = "dp",
    gauss_axis: str = "gauss",
) -> Mesh:
    """Global (dp, gauss) mesh. Default dp = process count (one DDP-style
    data shard per host, all of a host's chips in its gauss group) —
    so the gauss-axis collectives ride ICI and only the dp gradient
    reduce crosses DCN."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = max(jax.process_count(), 1)
    if len(devices) % dp != 0:
        raise ValueError(f"{len(devices)} devices not divisible by dp={dp}")
    arr = np.array(devices).reshape(dp, len(devices) // dp)
    return Mesh(arr, (dp_axis, gauss_axis))


def host_local_indices(n_frames: int, ctx: Optional[DistContext] = None,
                       dp: Optional[int] = None):
    """Frame indices this process serves (DDP-sampler style shard).

    With dp == process_count (default) this is the strided shard:
    process p of P owns frames p, p+P, p+2P, ... More generally a
    process owns the frames whose dp rank (frame % dp) falls in its
    contiguous rank block. When n_frames % dp != 0 the trainer's cyclic
    serving rotates frames across ranks over epochs, so host-local
    loading needs n_frames % dp == 0 (pad or trim the dataset)."""
    ctx = ctx or dist_context()
    dp = dp or max(ctx.process_count, 1)
    dpl = max(dp // max(ctx.process_count, 1), 1)
    return [f for f in range(n_frames)
            if (f % dp) // dpl == ctx.process_index]


def put_dp(mesh: Mesh, x, dp_axis: str = "dp"):
    """Place a replicated-on-every-host (dp, ...) array with the dp axis
    sharded: single-process device_put, multi-process each host provides
    its contiguous dp-rank block (no cross-host movement)."""
    ctx = dist_context()
    sh = NamedSharding(mesh, P(dp_axis))
    x = np.asarray(x)
    if ctx.process_count == 1:
        return jax.device_put(jnp.asarray(x), sh)
    dpl = x.shape[0] // ctx.process_count
    local = x[ctx.process_index * dpl:(ctx.process_index + 1) * dpl]
    return jax.make_array_from_process_local_data(sh, local)


def host_local_value(x) -> np.ndarray:
    """Materialize a (possibly global) array on THIS host, shard-wise.

    Multi-host checkpointing helper: `np.asarray` refuses global arrays
    that are not fully addressable. Under the hybrid (dp, gauss) layout
    every state array is replicated across hosts (dp axis) and at most
    sharded over the host-local `gauss` axis, so this process's
    addressable shards always cover the full global shape — assemble
    them directly, with no cross-host traffic. Raises if coverage is
    incomplete (a purely cross-host sharding would need a gather)."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable or x.is_fully_replicated:
        return np.asarray(x)
    out = np.empty(x.shape, x.dtype)
    # Coverage is a property of the shard INDEX RANGES, not the elements:
    # count covered elements from the slice extents instead of scanning a
    # full-shape bool mask (which costs O(size) host memory + a pass per
    # checkpointed array at 1M-capacity state tensors). Shards of one
    # jax.Array never overlap, so element-count equality == coverage.
    # Replicated-axis duplicates (e.g. the same gauss-slice on every
    # local dp row) repeat the same index tuple: dedupe before counting.
    seen = {}
    for s in x.addressable_shards:
        key = tuple((sl.start, sl.stop, sl.step) for sl in s.index)
        if key not in seen:
            out[s.index] = np.asarray(s.data)
            seen[key] = int(np.prod(s.data.shape))
    if sum(seen.values()) != x.size:
        raise ValueError(
            "host-local shards do not cover the global array "
            f"(shape {x.shape}, sharding {x.sharding}); checkpointing "
            "this layout requires a cross-host gather"
        )
    return out


def shard_state_hybrid(mesh: Mesh, params, alive, adam, stats,
                       gauss_axis: str = "gauss"):
    """Gaussian state: capacity axis sharded over `gauss`, replicated
    over `dp` (the DDP replica layout, but sharded within each host)."""
    gs = NamedSharding(mesh, P(gauss_axis))
    rep = NamedSharding(mesh, P())
    put = lambda t: jax.device_put(
        t, gs if getattr(t, "ndim", 0) >= 1 else rep
    )
    return (
        jax.tree.map(put, params),
        put(alive),
        jax.tree.map(put, adam),
        jax.tree.map(put, stats),
    )


def stack_frames(mesh: Mesh, cams, batches, dp_axis: str = "dp"):
    """Global (dp, ...) camera/batch arrays from per-process local
    frames. Single-process: a plain stack + device_put. Multi-process:
    each host contributes its local frames along the dp axis
    (`jax.make_array_from_process_local_data` — no cross-host data
    movement)."""
    ctx = dist_context()
    cam_stack = jax.tree.map(lambda *xs: np.stack(xs), *cams)
    batch_stack = {
        k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]
    }
    def put(x):
        sh = NamedSharding(mesh, P(dp_axis))
        if ctx.process_count == 1:
            return jax.device_put(jnp.asarray(x), sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, cam_stack), {
        k: put(v) for k, v in batch_stack.items()
    }


def make_dp_train_step(
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    raster_cfg: RasterizeConfig,
    sh_degree: int,
    mesh: Mesh,
    dp_axis: str = "dp",
) -> Callable:
    """Hybrid-parallel train step: manual shard_map over `dp` (each dp
    group computes gradients for its own frame; GSPMD shards the
    per-Gaussian work over `gauss` inside), `lax.pmean` of the Gaussian
    gradients across `dp`, one Adam update on the averaged gradients.

    Inputs: params/alive/adam/stats laid out by `shard_state_hybrid`;
    cameras/batch/keys stacked (dp, ...) by `stack_frames`; the
    camera-opt state replicated with the (dp,) global frame indices.
    Returns the same layout plus (mean loss, updated cam-opt state).
    """
    from dnsplatter_tpu.models.dn_model import (
        apply_binary_opacities, compute_loss, get_outputs,
    )
    from dnsplatter_tpu.train.optim import adam_step, cam_opt_update
    from dnsplatter_tpu.train.strategy import update_stats

    max_size = float(max(raster_cfg.width, raster_cfg.height))
    use_cam_opt = model_cfg.camera_optimizer_mode != "off"

    def grads_one(params, alive, cams1, batch1, step, keys1, adjs1):
        """Body for one dp group: grads for ITS frame + pmean over dp."""
        cam = jax.tree.map(lambda x: x[0], cams1)
        batch = {k: v[0] for k, v in batch1.items()}
        key = keys1[0]
        adj = adjs1[0]
        kbg, kloss = jax.random.split(key)
        p = apply_binary_opacities(params, alive, model_cfg, step)
        sink = jnp.zeros_like(p.means[:, :2])

        def loss_fn(p, abs_sink, adj):
            c = cam
            if use_cam_opt:
                from dnsplatter_tpu.models.camera_opt import apply_adjustment

                c = apply_adjustment(cam, adj)
            outputs, info = get_outputs(
                p, alive, c, model_cfg, raster_cfg, sh_degree=sh_degree,
                absgrad_sink=abs_sink, training=True, rng=kbg,
            )
            loss, ld = compute_loss(
                outputs, batch, p, alive, c, model_cfg, step, kloss
            )
            return loss, (ld, info)

        (loss, (_, info)), (gp, gabs, gadj) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(p, sink, adj)

        # DDP-equivalent gradient average across the dp frames; stats
        # combine like dp sequential accumulation steps (absgrad sums,
        # visibility any, screen radius max — train/strategy.py).
        gp = jax.lax.pmean(gp, dp_axis)
        gabs = jax.lax.psum(gabs, dp_axis)
        loss = jax.lax.pmean(loss, dp_axis)
        radii = jax.lax.pmax(info.radii, dp_axis)
        valid = jax.lax.pmax(info.valid.astype(jnp.float32), dp_axis)
        return gp, gabs, loss, radii, valid, gadj[None]

    @jax.jit
    def step_fn(params, alive, adam, stats, cameras, batch, step, keys,
                cam_state, frame_idx):
        body = jax.shard_map(
            grads_one,
            mesh=mesh,
            in_specs=(
                P(), P(),
                jax.tree.map(lambda _: P(dp_axis), cameras),
                {k: P(dp_axis) for k in batch},
                P(), P(dp_axis), P(dp_axis),
            ),
            out_specs=(P(), P(), P(), P(), P(), P(dp_axis)),
            axis_names={dp_axis},  # manual over dp; gauss stays GSPMD
            check_vma=False,
        )
        cam_adjs = cam_state.adj[frame_idx]  # (dp, 6) tiny gather
        gp, gabs, loss, radii, valid, gadjs = body(
            params, alive, cameras, batch, step, keys, cam_adjs
        )
        am = alive
        gp = jax.tree.map(
            lambda g: g * am.reshape((-1,) + (1,) * (g.ndim - 1)), gp
        )
        new_params, new_adam = adam_step(optim_cfg, params, gp, adam, step)
        new_stats = update_stats(stats, gabs, radii, valid > 0.5, max_size)
        # Pose-opt state update stays in-jit (replicated state + a (dp,)
        # batched scatter-add of the per-frame grads; duplicate indices
        # accumulate), so it is process-count-agnostic.
        new_cam = (cam_opt_update(optim_cfg, cam_state, frame_idx, gadjs,
                                  step)
                   if use_cam_opt else cam_state)
        return new_params, new_adam, new_stats, loss, new_cam

    return step_fn
