"""g_nerfacto / g_depthnerfacto baselines: hash-field NeRF ray marching.

Parity: dn_splatter/eval/baseline_models/g_nerfacto.py (RGB, + added
depth metrics and NearFar collider) and g_depthnerfacto.py (adds a depth
loss on the expected-depth render). Compact JAX implementation:
hierarchical sampling (uniform coarse + pdf fine) over a hash-encoded
density/color field, standard volume rendering with expected depth.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.baselines import fields as F


@dataclasses.dataclass(frozen=True)
class NerfactoConfig:
    near: float = 0.05
    far: float = 12.0
    n_coarse: int = 64
    n_fine: int = 64
    hash: F.HashGridConfig = F.HashGridConfig()
    hidden: int = 64
    geo_feat: int = 15
    use_depth_loss: bool = False  # g_depthnerfacto
    depth_lambda: float = 0.1
    scene_scale: float = 4.0  # world box [-s, s] mapped into [0,1]^3


class NerfactoParams(NamedTuple):
    tables: jax.Array
    density_mlp: Dict[str, jax.Array]
    color_mlp: Dict[str, jax.Array]


def init_params(key: jax.Array, cfg: NerfactoConfig) -> NerfactoParams:
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = cfg.hash.n_levels * cfg.hash.features_per_level
    return NerfactoParams(
        tables=F.init_hash_grid(k1, cfg.hash),
        density_mlp=F.init_mlp(k2, (in_dim, cfg.hidden, 1 + cfg.geo_feat)),
        color_mlp=F.init_mlp(k3, (cfg.geo_feat + 9, cfg.hidden, cfg.hidden, 3)),
    )


def field(params: NerfactoParams, cfg: NerfactoConfig, pts: jax.Array,
          dirs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """pts (..., 3) world, dirs (..., 3) -> (density (...), rgb (..., 3))."""
    x01 = jnp.clip(pts / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
    enc = F.hash_encode(params.tables, x01, cfg.hash)
    h = F.mlp(params.density_mlp, enc)
    density = jax.nn.softplus(h[..., 0] - 1.0)
    geo = h[..., 1:]
    denc = F.sh_dir_encode(dirs)
    rgb = F.mlp(params.color_mlp, jnp.concatenate([geo, denc], -1),
                jax.nn.sigmoid)
    return density, rgb


def _render_weights(density: jax.Array, ts: jax.Array) -> jax.Array:
    """(R, S) densities + (R, S) sample distances -> (R, S) weights."""
    deltas = jnp.diff(ts, axis=-1, append=ts[..., -1:] + 1e10)
    alpha = 1.0 - jnp.exp(-density * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1
    )
    return alpha * trans


def _sample_pdf(key, ts, weights, n: int) -> jax.Array:
    """Inverse-CDF resampling between coarse sample midpoints."""
    mids = 0.5 * (ts[..., 1:] + ts[..., :-1])
    w = weights[..., 1:-1] + 1e-5
    pdf = w / jnp.sum(w, -1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros_like(pdf[..., :1]), jnp.cumsum(pdf, -1)], -1
    )
    u = jax.random.uniform(key, ts.shape[:-1] + (n,))
    idx = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right")
    )(cdf, u)
    idx = jnp.clip(idx, 1, cdf.shape[-1] - 1)
    lo = jnp.take_along_axis(cdf, idx - 1, -1)
    hi = jnp.take_along_axis(cdf, idx, -1)
    t_lo = jnp.take_along_axis(mids, jnp.clip(idx - 1, 0, mids.shape[-1] - 1), -1)
    t_hi = jnp.take_along_axis(mids, jnp.clip(idx, 0, mids.shape[-1] - 1), -1)
    frac = (u - lo) / jnp.maximum(hi - lo, 1e-8)
    return t_lo + frac * (t_hi - t_lo)


def render_rays(
    params: NerfactoParams,
    cfg: NerfactoConfig,
    origins: jax.Array,  # (R, 3)
    dirs: jax.Array,  # (R, 3) unit
    key: jax.Array,
) -> Dict[str, jax.Array]:
    r = origins.shape[0]
    kc, kf = jax.random.split(key)
    t_coarse = jnp.linspace(cfg.near, cfg.far, cfg.n_coarse)
    t_coarse = jnp.broadcast_to(t_coarse, (r, cfg.n_coarse))
    jitter = jax.random.uniform(kc, (r, cfg.n_coarse)) * (
        (cfg.far - cfg.near) / cfg.n_coarse
    )
    t_coarse = t_coarse + jitter

    pts = origins[:, None] + t_coarse[..., None] * dirs[:, None]
    dens_c, _ = field(params, cfg, pts, jnp.broadcast_to(dirs[:, None], pts.shape))
    w_c = _render_weights(dens_c, t_coarse)

    t_fine = _sample_pdf(kf, t_coarse, jax.lax.stop_gradient(w_c), cfg.n_fine)
    ts = jnp.sort(jnp.concatenate([t_coarse, t_fine], -1), -1)
    pts = origins[:, None] + ts[..., None] * dirs[:, None]
    dens, rgb = field(params, cfg, pts,
                      jnp.broadcast_to(dirs[:, None], pts.shape))
    w = _render_weights(dens, ts)
    rgb_out = jnp.sum(w[..., None] * rgb, axis=1)
    acc = jnp.sum(w, axis=1, keepdims=True)
    depth = jnp.sum(w * ts, axis=1, keepdims=True) / jnp.maximum(acc, 1e-8)
    return {"rgb": rgb_out, "depth": depth, "accumulation": acc}


def camera_rays(camera, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """pixels (R, 2) int (x, y) -> world-space (origins, unit dirs)."""
    x = (pixels[:, 0].astype(jnp.float32) + 0.5 - camera.cx) / camera.fx
    y = (pixels[:, 1].astype(jnp.float32) + 0.5 - camera.cy) / camera.fy
    from dnsplatter_tpu.ops.camera import GL_TO_CV

    d_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)  # OpenCV frame
    c2w_cv = camera.c2w @ GL_TO_CV
    d_world = d_cam @ c2w_cv[:3, :3].T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    o = jnp.broadcast_to(c2w_cv[:3, 3], d_world.shape)
    return o, d_world


def make_train_step(cfg: NerfactoConfig, lr: float = 1e-2):
    """Adam train step over random pixel rays of one frame."""
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, camera, image, depth_gt, key):
        kpix, kray = jax.random.split(key)
        n_rays = 1024
        px = jax.random.randint(kpix, (n_rays, 2), 0,
                                jnp.array([camera.width, camera.height]))
        o, d = camera_rays(camera, px)
        gt = image[px[:, 1], px[:, 0]]

        def loss_fn(p):
            out = render_rays(p, cfg, o, d, kray)
            loss = jnp.mean((out["rgb"] - gt) ** 2)
            if cfg.use_depth_loss and depth_gt is not None:
                dgt = depth_gt[px[:, 1], px[:, 0]]
                mask = (dgt[:, 0] > 0.1).astype(jnp.float32)
                loss = loss + cfg.depth_lambda * jnp.sum(
                    mask * jnp.abs(out["depth"][:, 0] - dgt[:, 0])
                ) / jnp.maximum(mask.sum(), 1.0)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt
