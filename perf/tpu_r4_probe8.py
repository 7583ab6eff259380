"""Round-4 probe v8: depthq sort scheme A/B at N=1M.

depthq packs `tile * 2^20 + quantized-depth` into the uint32 binning
key, killing the N-scale depth argsort and the (N, 16) depth-order
table gather (the payload table stays in original parameter order).
Expected win ~8-12 ms/frame vs the packed32 scheme at N=1M.

Baselines: perf/tpu_r4_probe7.py's full_fwd_v7 / full_fb_mono_v7.
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


timed("full_fwd_depthq", rep(full_fwd(make_cfg(sort_scheme="depthq"))))
timed("full_fb_depthq", rep(full_fb(make_cfg(sort_scheme="depthq"))))
timed("full_fb_depthq_p16",
      rep(full_fb(make_cfg(sort_scheme="depthq", reduce_pieces=16))))

# on-device render agreement: depthq vs packed32 forward image
def render(cfg, mm):
    p = project_gaussians(mm, params.quats, jnp.exp(params.scales),
                          viewmat, fx, fy, cx, cy, W, H, opacities=opac)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                         p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
    return img

iq = np.asarray(jax.jit(lambda m: render(make_cfg(sort_scheme="depthq"), m))(
    params.means))
ix = np.asarray(jax.jit(lambda m: render(make_cfg(), m))(params.means))
rel = float(np.max(np.abs(iq - ix)) / (np.max(np.abs(ix)) + 1e-8))
print(f"depthq-vs-exact render rel: {rel:.2e}", flush=True)
