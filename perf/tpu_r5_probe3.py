"""Round-5 probe v3: compact_frac sweep at tighter budgets.

probe1 (tpu_r5_probe.py) measured live-window fractions 0.328 (100k) /
0.112 (1M) and wins of -1.6 / -19.5 ms at frac=0.5. The runtime
fallback makes over-tight budgets safe (worst case the uncompacted
bykey path, +3 ms vs legacy), so sweep toward the live fraction.
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

W, H = 1024, 576
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


def scene(n, scale_shift, capacity):
    key = jax.random.PRNGKey(0)
    params, alive = make_gt_gaussians(key, n, extent=1.5,
                                      scale_shift=scale_shift)
    cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
    viewmat = cam.viewmat()
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx),
                      float(cam.cy))
    opac = jax.nn.sigmoid(params.opacities)
    feats = jnp.concatenate([jnp.ones((n, 3)) * 0.5, params.normals], -1)

    def make_cfg(**kw):
        kw.setdefault("sort_scheme", "depthq")
        return R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                                 tile_block=16, pair_capacity=capacity,
                                 backend="pallas", **kw)

    def full_fb(cfg):
        def body(seed):
            def loss(mm):
                p = project_gaussians(mm, params.quats,
                                      jnp.exp(params.scales),
                                      viewmat, fx, fy, cx, cy, W, H,
                                      opacities=opac)
                allf = jnp.concatenate([feats, p.depths[:, None]], -1)
                img, a = R.rasterize(p.means2d, p.conics, p.depths, opac,
                                     allf, p.valid & (alive > 0.5), cfg,
                                     radii=p.radii_xy)
                return jnp.sum(img) + jnp.sum(a)
            return jax.grad(loss)(params.means + seed * 1e-9).sum()
        return body

    return make_cfg, full_fb


print("--- N=1M ---", flush=True)
make_cfg, full_fb = scene(1_000_000, -0.7675284, 5_242_880)
for frac in (0.3, 0.2, 0.15):
    timed(f"1M fb_compact{frac}", rep(full_fb(make_cfg(compact_frac=frac))))

print("--- N=100k ---", flush=True)
make_cfg, full_fb = scene(100_000, 0.0, 1_441_792)
for frac in (0.45, 0.4, 0.37):
    timed(f"100k fb_compact{frac}", rep(full_fb(make_cfg(compact_frac=frac))))
