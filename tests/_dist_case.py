"""Shared scenario for the multi-process distributed tests.

Builds one deterministic tiny scene + Gaussian state and runs ONE hybrid
dp x gauss train step (parallel/distributed.py). The same code serves
the real 2-process run (tests/_dist_worker.py, gloo CPU collectives over
localhost) and the degenerate single-process reference the parent
compares against — DDP equivalence, the property the reference gets from
torch (dn_pipeline.py:122-128).

Every step input is materialized as a GLOBAL array (multi-controller JAX
requires jit inputs to span the full mesh): state via
`shard_state_hybrid`, frames via `stack_frames`, per-frame keys via
`put_dp`, and replicated leaves via `replicate` below.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WIDTH = HEIGHT = 32
N_GAUSS = 128
CAPACITY = 256
PAIR_CAPACITY = 1 << 10


@dataclasses.dataclass
class Case:
    mesh: Mesh
    scene: object
    params: object
    alive: object
    adam: object
    stats: object
    model_cfg: object
    optim_cfg: object
    raster_cfg: object
    dp: int


def replicate(mesh: Mesh, x):
    """A fully-replicated global array from identical per-process data
    (multi-process `jax.device_put` to a global sharding — every process
    holds the same host value, like `shard_state_hybrid`)."""
    return jax.device_put(np.asarray(x), NamedSharding(mesh, P()))


def build_case(dp: int, devices: Optional[Sequence[jax.Device]] = None) -> Case:
    from dnsplatter_tpu.data.synthetic import make_synthetic_scene
    from dnsplatter_tpu.models.dn_model import ModelConfig
    from dnsplatter_tpu.models.gaussians import init_from_points
    from dnsplatter_tpu.ops.rasterize import RasterizeConfig
    from dnsplatter_tpu.parallel import distributed as D
    from dnsplatter_tpu.train.optim import OptimConfig, init_adam
    from dnsplatter_tpu.train.strategy import init_stats

    mesh = D.make_hybrid_mesh(dp=dp, devices=devices)
    scene = make_synthetic_scene(seed=0, n_gaussians=N_GAUSS, n_cameras=dp,
                                 width=WIDTH, height=HEIGHT,
                                 pair_capacity=PAIR_CAPACITY)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    params, alive, _ = init_from_points(
        jax.random.PRNGKey(0), pts, cols, sh_degree=1, capacity=CAPACITY
    )
    # np leaves: device_put to the global sharding from identical host
    # values on every process.
    params = jax.tree.map(np.asarray, params)
    alive = np.asarray(alive)
    adam = jax.tree.map(np.asarray, init_adam(params))
    stats = jax.tree.map(np.asarray, init_stats(CAPACITY))
    params, alive, adam, stats = D.shard_state_hybrid(
        mesh, params, alive, adam, stats
    )
    # camera_optimizer_mode ON: the pose-opt state update (replicated
    # CamOptState + batched scatter-add of per-frame tangent grads) is
    # the one training component that must be process-count-agnostic —
    # exercise it across dp ranks.
    model_cfg = ModelConfig(use_depth_loss=True, depth_lambda=0.2,
                            use_normal_loss=True, sh_degree=1,
                            camera_optimizer_mode="SO3xR3")
    raster_cfg = RasterizeConfig(width=WIDTH, height=HEIGHT, tile_size=16,
                                 chunk=16, tile_block=2,
                                 pair_capacity=PAIR_CAPACITY)
    return Case(mesh=mesh, scene=scene, params=params, alive=alive,
                adam=adam, stats=stats, model_cfg=model_cfg,
                optim_cfg=OptimConfig(), raster_cfg=raster_cfg, dp=dp)


def run_dp_step(case: Case, frame_indices: List[int]):
    """One hybrid DP train step; this process serves `frame_indices`.

    Returns (loss, sum|means|) — both replicated scalars every rank can
    read locally.
    """
    from dnsplatter_tpu.parallel import distributed as D
    from dnsplatter_tpu.train.optim import init_cam_opt

    mesh = case.mesh
    cams, batches = zip(*[case.scene.get(i) for i in frame_indices])
    cam_g, batch_g = D.stack_frames(mesh, cams, batches)
    keys_global = np.asarray(
        jax.random.split(jax.random.PRNGKey(5), case.dp)
    )
    keys = D.put_dp(mesh, keys_global)
    cam_state = jax.tree.map(
        lambda x: replicate(mesh, x), init_cam_opt(case.dp)
    )
    step = replicate(mesh, np.asarray(0, np.int32))
    frame_idx = replicate(mesh, np.arange(case.dp, dtype=np.int32))

    step_fn = D.make_dp_train_step(
        case.model_cfg, case.optim_cfg, case.raster_cfg, 1, mesh
    )
    new_params, _, _, loss, new_cam = step_fn(
        case.params, case.alive, case.adam, case.stats, cam_g, batch_g,
        step, keys, cam_state, frame_idx,
    )
    # Checkpoint-style host materialization of the gauss-sharded params —
    # in the 2-process run this exercises host_local_value on a truly
    # non-fully-addressable global array (the save_checkpoint path).
    means_host = D.host_local_value(new_params.means)
    assert means_host.shape == (CAPACITY, 3)
    means_sum = float(np.sum(np.abs(means_host)))
    # Pose-opt accumulators pick up each dp rank's frame gradient via the
    # batched scatter-add — replicated output, must agree across ranks.
    cam_sum = float(np.sum(np.abs(D.host_local_value(new_cam.accum))))
    return jax.device_get(loss), means_sum, cam_sum
