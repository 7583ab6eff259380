"""Device-mesh sharding for multi-chip training (jax.sharding + GSPMD).

The reference's only in-train parallelism is torch DDP over whole replicas
(dn_pipeline.py:122-128). The TPU-native design shards the *Gaussians*
instead: every per-Gaussian stage (covariance, projection, SH evaluation,
Adam update, refinement scatters) is embarrassingly parallel along the
capacity axis, so params/optimizer/stats are laid out
`NamedSharding(mesh, P("gauss"))` and XLA GSPMD inserts the collectives
(an all-gather of the ~40 B/Gaussian screen-space payload before tile
binning, and a reduce-scatter of parameter gradients after the backward
scatter-adds) over ICI. Host data loading stays host-local; nothing rides
DCN per step.

This module is the GSPMD path — a `shard_map` pipeline with explicit
per-tile exchange lives on the roadmap for when per-chip tile ownership
(image sharding) is profitable.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.train.optim import OptimConfig
from dnsplatter_tpu.train import trainer as trainer_lib


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "gauss") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def gauss_sharding(mesh: Mesh, axis_name: str = "gauss") -> NamedSharding:
    """Shard along the leading (capacity) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_gaussian_state(mesh: Mesh, params, alive, adam, stats,
                         axis_name: str = "gauss"):
    """device_put the full training state with Gaussian-axis sharding."""
    gs = gauss_sharding(mesh, axis_name)
    rep = replicated(mesh)
    put = lambda t: jax.device_put(t, gs if getattr(t, "ndim", 0) >= 1 else rep)
    params = jax.tree.map(put, params)
    alive = put(alive)
    adam = jax.tree.map(put, adam)
    stats = jax.tree.map(put, stats)
    return params, alive, adam, stats


def make_sharded_train_step(
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    raster_cfg: RasterizeConfig,
    sh_degree: int,
    mesh: Mesh,
    axis_name: str = "gauss",
) -> Callable:
    """Jit the train step with explicit state shardings over the mesh.

    Inputs: Gaussian state sharded along capacity; camera/batch replicated
    (each step renders one full image; batches are small next to the
    Gaussian state). Outputs keep the same layout, so the step is a
    fixed-layout pure function suitable for an arbitrary-length host loop.
    """
    base = trainer_lib.make_train_step(model_cfg, optim_cfg, raster_cfg,
                                       sh_degree)
    inner = base.__wrapped__ if hasattr(base, "__wrapped__") else base
    # Shardings come from the placed inputs (shard_gaussian_state); GSPMD
    # propagates them through projection/binning/compositing and inserts
    # the gather/reduce collectives. Donation keeps the big Gaussian-state
    # buffers in place across steps.
    return jax.jit(inner, donate_argnums=(0, 2, 3))
