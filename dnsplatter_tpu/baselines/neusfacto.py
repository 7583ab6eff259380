"""g_neusfacto baseline: NeuS-style SDF field with RGB+D+N supervision.

Parity: dn_splatter/eval/baseline_models/g_neusfacto.py — an SDF neural
field rendered with NeuS's unbiased logistic-CDF weighting, trained with
RGB + sensor-depth (freespace/sdf, losses.py:299-352 SensorDepthLoss) +
mono-normal losses. Normals come from the analytic SDF gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.baselines import fields as F
from dnsplatter_tpu.baselines.nerfacto import camera_rays  # noqa: F401


@dataclasses.dataclass(frozen=True)
class NeuSConfig:
    near: float = 0.05
    far: float = 8.0
    n_samples: int = 96
    hash: F.HashGridConfig = F.HashGridConfig(n_levels=10)
    hidden: int = 64
    geo_feat: int = 15
    scene_scale: float = 4.0
    depth_lambda: float = 0.1
    normal_lambda: float = 0.05
    freespace_trunc: float = 0.05  # SensorDepthLoss truncation


class NeuSParams(NamedTuple):
    tables: jax.Array
    sdf_mlp: Dict[str, jax.Array]
    color_mlp: Dict[str, jax.Array]
    inv_s: jax.Array  # () learned sharpness (log scale)


def init_params(key: jax.Array, cfg: NeuSConfig) -> NeuSParams:
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = cfg.hash.n_levels * cfg.hash.features_per_level
    return NeuSParams(
        tables=F.init_hash_grid(k1, cfg.hash),
        sdf_mlp=F.init_mlp(k2, (in_dim + 3, cfg.hidden, 1 + cfg.geo_feat)),
        color_mlp=F.init_mlp(
            k3, (cfg.geo_feat + 9 + 3, cfg.hidden, 3)
        ),
        inv_s=jnp.asarray(2.3),  # exp(2.3) ~ 10
    )


def _field_h(params: NeuSParams, cfg: NeuSConfig, pts: jax.Array) -> jax.Array:
    """(…, 1 + geo_feat) raw field head: [sdf residual, geo features]."""
    x01 = jnp.clip(pts / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
    enc = F.hash_encode(params.tables, x01, cfg.hash)
    return F.mlp(params.sdf_mlp, jnp.concatenate([enc, pts], -1))


def sdf_fn(params: NeuSParams, cfg: NeuSConfig, pts: jax.Array) -> jax.Array:
    h = _field_h(params, cfg, pts)
    # geometric init bias: sphere-ish SDF at start
    return h[..., 0] + (jnp.linalg.norm(pts, axis=-1) - 1.0)


def sdf_geo_and_grad(params, cfg, pts):
    """One field evaluation for (sdf, geo features, sdf gradient):
    value_and_grad shares the forward between the value and the gradient,
    and the aux output carries the geo features the color head needs —
    the naive formulation evaluated the hash-encode + MLP three times."""
    flat = pts.reshape(-1, 3)

    def f(p):
        h = _field_h(params, cfg, p[None])[0]
        sdf = h[0] + (jnp.linalg.norm(p) - 1.0)
        return sdf, h[1:]

    (sdf, geo), grad = jax.vmap(jax.value_and_grad(f, has_aux=True))(flat)
    return (sdf.reshape(pts.shape[:-1]),
            geo.reshape(pts.shape[:-1] + (geo.shape[-1],)),
            grad.reshape(pts.shape))


def render_rays(params: NeuSParams, cfg: NeuSConfig, origins, dirs, key):
    r = origins.shape[0]
    ts = jnp.linspace(cfg.near, cfg.far, cfg.n_samples)
    ts = jnp.broadcast_to(ts, (r, cfg.n_samples))
    ts = ts + jax.random.uniform(key, ts.shape) * (
        (cfg.far - cfg.near) / cfg.n_samples
    )
    pts = origins[:, None] + ts[..., None] * dirs[:, None]
    sdf, geo, grad = sdf_geo_and_grad(params, cfg, pts)

    # NeuS alpha from logistic CDF of SDF along the ray
    inv_s = jnp.exp(params.inv_s)
    cdf = jax.nn.sigmoid(sdf * inv_s)
    alpha = jnp.clip(
        (cdf[..., :-1] - cdf[..., 1:]) / jnp.maximum(cdf[..., :-1], 1e-6),
        0.0, 1.0,
    )
    alpha = jnp.concatenate([alpha, jnp.zeros_like(alpha[..., :1])], -1)
    trans = jnp.cumprod(1.0 - alpha + 1e-7, -1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1
    )
    w = alpha * trans

    # rsqrt(|g|^2 + eps): jnp.linalg.norm has a NaN gradient at exactly 0.
    normal = grad * jax.lax.rsqrt(
        jnp.sum(grad * grad, axis=-1, keepdims=True) + 1e-12
    )
    denc = jnp.broadcast_to(
        F.sh_dir_encode(dirs)[:, None, :], pts.shape[:-1] + (9,)
    )
    rgb = F.mlp(params.color_mlp,
                jnp.concatenate([geo, denc, normal], -1), jax.nn.sigmoid)

    acc = jnp.sum(w, -1, keepdims=True)
    out_rgb = jnp.sum(w[..., None] * rgb, axis=1)
    depth = jnp.sum(w * ts, -1, keepdims=True) / jnp.maximum(acc, 1e-8)
    out_normal = jnp.sum(w[..., None] * normal, axis=1)
    eik = jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
    return {
        "rgb": out_rgb, "depth": depth, "normal": out_normal,
        "accumulation": acc, "eikonal": eik, "sdf": sdf, "ts": ts, "w": w,
    }


def sensor_depth_loss(out, depth_gt_rays: jax.Array,
                      trunc: float) -> jax.Array:
    """Freespace + SDF supervision along rays (losses.py:299-352)."""
    ts = out["ts"]
    sdf = out["sdf"]
    d = depth_gt_rays  # (R, 1), broadcasts against (R, S) samples
    valid = (d[:, 0] > 0.1)[:, None]
    # freespace: samples well before the surface should have sdf > 0
    free = (ts < d - trunc) & valid
    l_free = jnp.sum(jnp.where(free, jax.nn.relu(-sdf), 0.0)) / jnp.maximum(
        jnp.sum(free), 1.0
    )
    # near-surface: sdf should match depth difference
    near = (jnp.abs(ts - d) <= trunc) & valid
    l_sdf = jnp.sum(jnp.where(near, jnp.abs(sdf - (d - ts)), 0.0)) / (
        jnp.maximum(jnp.sum(near), 1.0)
    )
    return l_free + l_sdf


def make_train_step(cfg: NeuSConfig, lr: float = 5e-3):
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, camera, image, depth_gt, normal_gt, key):
        kpix, kray = jax.random.split(key)
        n_rays = 512
        px = jax.random.randint(kpix, (n_rays, 2), 0,
                                jnp.array([camera.width, camera.height]))
        o, d = camera_rays(camera, px)
        gt = image[px[:, 1], px[:, 0]]

        def loss_fn(p):
            out = render_rays(p, cfg, o, d, kray)
            loss = jnp.mean((out["rgb"] - gt) ** 2) + 0.1 * out["eikonal"]
            if depth_gt is not None:
                dr = depth_gt[px[:, 1], px[:, 0]]
                loss = loss + cfg.depth_lambda * sensor_depth_loss(
                    out, dr, cfg.freespace_trunc
                )
            if normal_gt is not None:
                ngt = 2.0 * normal_gt[px[:, 1], px[:, 0]] - 1.0
                loss = loss + cfg.normal_lambda * jnp.mean(
                    jnp.abs(out["normal"] - ngt)
                )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt
