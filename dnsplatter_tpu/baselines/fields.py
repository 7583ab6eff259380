"""Neural fields: multiresolution hash encoding + MLP heads (pure JAX).

The TPU-native counterpart of the Instant-NGP/nerfacto field stack the
reference's baselines ride through nerfstudio. Hash tables are plain
learnable arrays; trilinear interpolation is 8 gathers + lerps, fully
batched over samples (VPU), with MLPs on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy on purpose: module-level jnp arrays initialize the JAX backend at
# import time (breaks jax.distributed.initialize ordering on multi-host).
PRIMES = np.array([1, 2654435761, 805459861], np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 12
    features_per_level: int = 2
    log2_table_size: int = 17
    base_res: int = 16
    max_res: int = 1024


def init_hash_grid(key: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """(L, T, F) learnable tables."""
    t = 1 << cfg.log2_table_size
    return (
        jax.random.uniform(
            key, (cfg.n_levels, t, cfg.features_per_level),
            minval=-1e-4, maxval=1e-4,
        )
    )


def hash_encode(tables: jax.Array, x: jax.Array,
                cfg: HashGridConfig) -> jax.Array:
    """x: (..., 3) in [0, 1] -> (..., L*F) features."""
    import math

    growth = (
        math.exp(
            (math.log(cfg.max_res) - math.log(cfg.base_res))
            / max(cfg.n_levels - 1, 1)
        )
        if cfg.n_levels > 1
        else 1.0
    )
    t = 1 << cfg.log2_table_size
    outs = []
    for lvl in range(cfg.n_levels):
        res = int(cfg.base_res * growth**lvl)
        xs = x * res
        x0 = jnp.floor(xs).astype(jnp.int32)
        frac = xs - x0
        feats = 0.0
        for corner in range(8):
            off = jnp.array(
                [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                jnp.int32,
            )
            c = (x0 + off).astype(jnp.uint32)
            h = (c[..., 0] * PRIMES[0]) ^ (c[..., 1] * PRIMES[1]) ^ (
                c[..., 2] * PRIMES[2]
            )
            idx = (h % t).astype(jnp.int32)
            w = jnp.prod(
                jnp.where(off == 1, frac, 1.0 - frac), axis=-1, keepdims=True
            )
            feats = feats + w * tables[lvl][idx]
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)


def init_mlp(key: jax.Array, sizes) -> Dict[str, jax.Array]:
    params = {}
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        params[f"w{i}"] = jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a)
        params[f"b{i}"] = jnp.zeros((b,))
    return params


def mlp(params: Dict[str, jax.Array], x: jax.Array,
        final_activation=None) -> jax.Array:
    n = len(params) // 2
    h = x
    for i in range(n):
        h = h @ params[f"w{i}"] + params[f"b{i}"]
        if i < n - 1:
            h = jax.nn.relu(h)
    return final_activation(h) if final_activation else h


def sh_dir_encode(dirs: jax.Array) -> jax.Array:
    """Degree-2 SH direction encoding (9 features)."""
    from dnsplatter_tpu.ops.sh import sh_basis

    d = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
    )
    return sh_basis(2, d)
