"""Stage-level TPU timing at the N=1M reference-default scale."""
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
cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                        tile_block=16, pair_capacity=5_242_880,
                        backend="pallas")
REPS = 8

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i+1), *args) for i in range(3)]
    for o in outs: float(np.asarray(o))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms/frame", flush=True)
    return dt

def scan_over(body):
    def outer(seed, means):
        def one(c, i):
            return c + body(means + (seed + i.astype(jnp.float32)) * 1e-9), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer

def proj_only(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    return jnp.sum(p.means2d) + jnp.sum(p.radii)

def stage_bin(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy,
                        (p.valid & (alive > 0.5)).astype(jnp.float32))
    return (jnp.sum(b.starts) + jnp.sum(b.pair_gauss[::997])).astype(jnp.float32)

def stage_payload(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    f = allf.shape[-1]
    opac_masked = jnp.where(validf > 0.5, opac, 0.0)
    fields = jnp.concatenate([p.means2d, p.conics, opac_masked[:, None],
                              allf, jnp.zeros((N, rp.PW - 6 - f))], -1)
    fields_s = fields[b.order]
    fields_s = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW))])
    payload = fields_s[b.pair_gauss].T
    return jnp.sum(payload[:, ::997])

def fwd_only(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                         p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
    return jnp.sum(img) + jnp.sum(a)

def fwd_bwd(m):
    def loss(mm):
        return fwd_only(mm)
    return jax.grad(loss)(m).sum()

for nm, body in [("proj", proj_only), ("proj+bin", stage_bin),
                 ("proj+bin+payload", stage_payload),
                 ("fwd", fwd_only), ("fwd+bwd", fwd_bwd)]:
    timed(nm, scan_over(body), params.means)
