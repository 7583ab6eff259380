"""Stage timing of the REAL pallas pipeline internals at N=1M.

Unlike tpu_profile_1m.py (whose intermediate stages re-do their own
gathers), this decomposes exactly what _raster_fwd / _raster_bwd run:
fused table build -> binning(fields passed) -> payload C-gather ->
forward kernel -> backward kernel -> sortpack reduce -> unpermute.
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
cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                        tile_block=16, pair_capacity=5_242_880,
                        backend="pallas")
REPS = 8
F = 7

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

def table(seed):
    m = params.means + seed * 1e-9
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    opm = jnp.where(validf > 0.5, opac, 0.0)
    rad2 = p.radii_xy
    fields = jnp.concatenate(
        [p.means2d, p.conics, opm[:, None], allf,
         jnp.zeros((N, 13 - 6 - F), jnp.float32), rad2, validf[:, None]], -1)
    order = jnp.argsort(jnp.where(validf > 0.5, p.depths, jnp.inf))
    fields_s = fields[order]
    return p, validf, order, fields_s

def s_table(seed):
    p, validf, order, fields_s = table(seed)
    return jnp.sum(fields_s[::997]) + jnp.sum(order[::997]).astype(jnp.float32)

def s_bin(seed):
    p, validf, order, fields_s = table(seed)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf,
                        conics=p.conics, opacities=opac,
                        order=order, fields_sorted=fields_s)
    return (jnp.sum(b.starts) + jnp.sum(b.pair_gauss[::997])).astype(jnp.float32)

def s_payload(seed):
    p, validf, order, fields_s = table(seed)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf,
                        conics=p.conics, opacities=opac,
                        order=order, fields_sorted=fields_s)
    fields = jnp.concatenate([fields_s[:, :rp.PW],
                              jnp.zeros((1, rp.PW), jnp.float32)])
    payload = fields[b.pair_gauss].T
    return jnp.sum(payload[:, ::997])

def s_fwdkernel(seed):
    p, validf, order, fields_s = table(seed)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf,
                        conics=p.conics, opacities=opac,
                        order=order, fields_sorted=fields_s)
    fields = jnp.concatenate([fields_s[:, :rp.PW],
                              jnp.zeros((1, rp.PW), jnp.float32)])
    payload = fields[b.pair_gauss].T
    out_t, tfin_t, last_t = rp.forward_tiles(
        payload, b.starts, b.counts, cfg.n_tiles_padded, F,
        cfg.tile_size, cfg.tiles_x, cfg.chunk)
    return jnp.sum(out_t[::7]) + jnp.sum(tfin_t[::7])

def full_fwd(seed):
    m = params.means + seed * 1e-9
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                         p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
    return jnp.sum(img) + jnp.sum(a)

def full_fb(seed):
    def loss(mm):
        p = project_gaussians(mm, params.quats, jnp.exp(params.scales),
                              viewmat, fx, fy, cx, cy, W, H, opacities=opac)
        allf = jnp.concatenate([feats, p.depths[:, None]], -1)
        img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                             p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
        return jnp.sum(img) + jnp.sum(a)
    return jax.grad(loss)(params.means + seed * 1e-9).sum()

for nm, body in [("table(argsort+gather)", s_table),
                 ("+bin", s_bin),
                 ("+payload-gather", s_payload),
                 ("+fwd-kernel", s_fwdkernel),
                 ("full fwd (rasterize)", full_fwd),
                 ("full fwd+bwd", full_fb)]:
    timed(nm, rep(body), )
