"""Round-4 probe v4: full-pipeline A/B after the piecewise reduction +
payload w13 changes, and the streamed-expand chunk sweep.

Baselines (round 3): full fwd ~82 ms, full fwd+bwd ~137.5 ms at N=1M.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops import rasterize as R
from dnsplatter_tpu.ops import rasterize_pallas as rp

N = 1_000_000; W, H = 1024, 576
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.5, scale_shift=-0.7675284)
cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
viewmat = cam.viewmat()
fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
opac = jax.nn.sigmoid(params.opacities)
feats = jnp.concatenate([jnp.ones((N, 3)) * 0.5, params.normals], -1)
REPS = 8

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(jnp.sum(out)) if hasattr(out, "shape") else np.asarray(out))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jnp.sum(o)) if hasattr(o, "shape") else np.asarray(o))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms/frame", flush=True)
    return dt

def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer

def make_cfg(**kw):
    return R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                             tile_block=16, pair_capacity=5_242_880,
                             backend="pallas", **kw)

def full_fb(cfg):
    def body(seed):
        def loss(mm):
            p = project_gaussians(mm, params.quats, jnp.exp(params.scales),
                                  viewmat, fx, fy, cx, cy, W, H,
                                  opacities=opac)
            allf = jnp.concatenate([feats, p.depths[:, None]], -1)
            img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                                 p.valid & (alive > 0.5), cfg,
                                 radii=p.radii_xy)
            return jnp.sum(img) + jnp.sum(a)
        return jax.grad(loss)(params.means + seed * 1e-9).sum()
    return body

def full_fwd(cfg):
    def body(seed):
        m = params.means + seed * 1e-9
        p = project_gaussians(m, params.quats, jnp.exp(params.scales),
                              viewmat, fx, fy, cx, cy, W, H, opacities=opac)
        allf = jnp.concatenate([feats, p.depths[:, None]], -1)
        img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                             p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
        return jnp.sum(img) + jnp.sum(a)
    return body

timed("full_fwd_new(w13)", rep(full_fwd(make_cfg())))
timed("full_fb_new(w13+pieces4)", rep(full_fb(make_cfg())))
timed("full_fb_mono(w13)", rep(full_fb(make_cfg(reduce_pieces=1))))
timed("full_fb_pieces8", rep(full_fb(make_cfg(reduce_pieces=8))))

# streamed-expand chunk sweep (5 int rows at C=5.24M)
C = 5_242_880
starts_np = np.concatenate([[0], np.cumsum(
    np.random.default_rng(0).integers(0, 11, N))]).astype(np.int32)
scale = C / starts_np[-1]
starts_np = (starts_np * scale).astype(np.int32)
starts_np[-1] = C
gs = jnp.asarray(starts_np)
vals5 = jnp.zeros((5, N), jnp.int32) + jnp.arange(N, dtype=jnp.int32)[None, :]
for ch in (512, 1024, 2048, 4096):
    def body(seed, v, ch=ch):
        vv = v + (0 * seed).astype(jnp.int32)
        acc = rp._expand_segments_stream(vv, gs, C, chunk=ch)
        return jnp.sum(acc[:, ::997]).astype(jnp.float32)
    timed(f"expand5_stream_chunk{ch}", rep(body), vals5)
