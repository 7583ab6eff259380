"""Round-4 decomposition probe at N=1M: where do the 140 ms actually go?

tpu_gather_probe.py showed an isolated (N+1,16)[idx] gather at C=5.24M
costs only ~5.5 ms — NOT the ~33 ms the stage deltas attributed to
"payload gather". Hypothesis: the cost is the materialized (C,16)->(16,C)
transpose feeding the Pallas kernel (minor dim 16 forces a bad relayout),
plus mis-attributed binning internals. This probe forces materialization
by consuming every candidate payload through the REAL forward kernel, and
splits the backward chain (kernel / reduction sort / packed reduce /
head-window merge) with prebuilt device inputs.
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
K = cfg.chunk

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

# ---- shared prefix (built once, device-resident) ----
def build_prefix():
    p = project_gaussians(params.means, params.quats, jnp.exp(params.scales),
                          viewmat, fx, fy, cx, cy, W, H, opacities=opac)
    validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    opm = jnp.where(validf > 0.5, opac, 0.0)
    fields = jnp.concatenate(
        [p.means2d, p.conics, opm[:, None], allf,
         jnp.zeros((N, 13 - 6 - F), jnp.float32), p.radii_xy,
         validf[:, None]], -1)
    order = jnp.argsort(jnp.where(validf > 0.5, p.depths, jnp.inf))
    fields_s = fields[order]
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf,
                        conics=p.conics, opacities=opac,
                        order=order, fields_sorted=fields_s)
    ftab = jnp.concatenate([fields_s[:, :rp.PW],
                            jnp.zeros((1, rp.PW), jnp.float32)])
    payload = ftab[b.pair_gauss].T
    return p, validf, order, fields_s, b, ftab, payload

prefix = jax.jit(build_prefix)
p, validf, order, fields_s, b, ftab, payload = jax.tree.map(
    lambda x: x, prefix())
jax.block_until_ready(payload)

out_t, tfin_t, last_t = jax.jit(
    lambda pay: rp.forward_tiles(pay, b.starts, b.counts,
                                 cfg.n_tiles_padded, F, cfg.tile_size,
                                 cfg.tiles_x, cfg.chunk))(payload)
g_out_t = jnp.ones_like(out_t)
g_alpha_t = jnp.ones_like(tfin_t)

def bwd_kernel(pay):
    grads, stage, nch = rp.backward_tiles(
        pay, b.starts, b.counts, g_out_t, g_alpha_t, tfin_t, last_t,
        cfg.n_tiles_padded, F, cfg.tile_size, cfg.tiles_x, cfg.chunk,
        pack_grads=True)
    return grads, stage

grads0, stage0 = jax.jit(bwd_kernel)(payload)
jax.block_until_ready(grads0)

# ---- A. table variants (N-scale) ----
def tableA(seed):  # current: (N,16) concat + row gather by order
    m = params.means + seed * 1e-9
    pr = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                           fx, fy, cx, cy, W, H, opacities=opac)
    vf = (pr.valid & (alive > 0.5)).astype(jnp.float32)
    allf = jnp.concatenate([feats, pr.depths[:, None]], -1)
    opm = jnp.where(vf > 0.5, opac, 0.0)
    flds = jnp.concatenate(
        [pr.means2d, pr.conics, opm[:, None], allf,
         jnp.zeros((N, 13 - 6 - F), jnp.float32), pr.radii_xy, vf[:, None]],
        -1)
    o = jnp.argsort(jnp.where(vf > 0.5, pr.depths, jnp.inf))
    fs = flds[o]
    return jnp.sum(fs[::997]) + jnp.sum(o[::997]).astype(jnp.float32)

def tableB(seed):  # field-major stack + take(axis=1)
    m = params.means + seed * 1e-9
    pr = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                           fx, fy, cx, cy, W, H, opacities=opac)
    vf = (pr.valid & (alive > 0.5)).astype(jnp.float32)
    opm = jnp.where(vf > 0.5, opac, 0.0)
    rows = [pr.means2d[:, 0], pr.means2d[:, 1], pr.conics[:, 0],
            pr.conics[:, 1], pr.conics[:, 2], opm] + \
           [feats[:, i] for i in range(6)] + [pr.depths] + \
           [pr.radii_xy[:, 0], pr.radii_xy[:, 1], vf]
    ft = jnp.stack(rows, 0)  # (16, N)
    o = jnp.argsort(jnp.where(vf > 0.5, pr.depths, jnp.inf))
    fts = jnp.take(ft, o, axis=1)
    return jnp.sum(fts[:, ::997]) + jnp.sum(o[::997]).astype(jnp.float32)

def proj_only(seed):
    m = params.means + seed * 1e-9
    pr = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                           fx, fy, cx, cy, W, H, opacities=opac)
    return jnp.sum(pr.means2d[::997]) + jnp.sum(pr.conics[::997])

def argsort_only(seed):
    d = p.depths + seed * 1e-9
    return jnp.sum(jnp.argsort(d)[::997]).astype(jnp.float32)

# ---- B. payload variants (C-scale), consumed by the REAL fwd kernel ----
def payloadD(seed, ftab_, pg):  # current: row gather + transpose
    ft = ftab_ + seed * 1e-9
    pay = ft[pg].T
    o, tf, la = rp.forward_tiles(pay, b.starts, b.counts, cfg.n_tiles_padded,
                                 F, cfg.tile_size, cfg.tiles_x, cfg.chunk)
    return jnp.sum(o[::7]) + jnp.sum(tf[::7])

def payloadE(seed, ftab_, pg):  # N-scale transpose + minor-axis take
    ft = (ftab_ + seed * 1e-9).T  # (16, N+1)
    pay = jnp.take(ft, pg, axis=1)
    o, tf, la = rp.forward_tiles(pay, b.starts, b.counts, cfg.n_tiles_padded,
                                 F, cfg.tile_size, cfg.tiles_x, cfg.chunk)
    return jnp.sum(o[::7]) + jnp.sum(tf[::7])

def fwd_only(seed, pay):
    pay = pay + seed * 0.0  # formal dependence; one elementwise pass
    o, tf, la = rp.forward_tiles(pay, b.starts, b.counts, cfg.n_tiles_padded,
                                 F, cfg.tile_size, cfg.tiles_x, cfg.chunk)
    return jnp.sum(o[::7]) + jnp.sum(tf[::7])

# ---- C. backward decomposition (prebuilt inputs) ----
def bwd_only(seed, pay):
    pay = pay + seed * 0.0
    grads, stage = bwd_kernel(pay)
    return (jnp.sum(grads[:, ::997]) + jnp.sum(stage[::7])).astype(jnp.float32)

def merge_only(seed, grads, stage):
    g = grads + (0 * seed).astype(jnp.int32)
    nwin = g.shape[1] // K
    w0 = b.starts[:-1] // K
    g = (g.reshape(g.shape[0], nwin, K)
         .at[:, w0].add(jnp.moveaxis(stage, 0, 1))
         .reshape(g.shape[0], nwin * K))
    return jnp.sum(g[:, ::997]).astype(jnp.float32)

def redsort_only(seed, grads):
    g = grads + (0 * seed).astype(jnp.int32)
    rows_used = (6 + F + 1) // 2
    outs = jax.lax.sort((b.pair_orig,) + tuple(g[i] for i in range(rows_used)),
                        num_keys=1)
    return sum(jnp.sum(o[::997]) for o in outs[1:]).astype(jnp.float32)

slab_sorted = jax.jit(lambda g: jnp.pad(jnp.stack(jax.lax.sort(
    (b.pair_orig,) + tuple(g[i] for i in range(7)), num_keys=1)[1:], 0),
    ((0, 0), (0, 512))))(grads0)
jax.block_until_ready(slab_sorted)

def reduce_only(seed, slab):
    s = slab + (0 * seed).astype(jnp.int32)
    per = rp.reduce_segments_packed(s, b.orig_starts, N)
    return jnp.sum(per[:, ::97])

for nm, body, args in [
    ("proj_only", proj_only, ()),
    ("argsort_only", argsort_only, ()),
    ("tableA(rowmajor)", tableA, ()),
    ("tableB(fieldmajor)", tableB, ()),
    ("payloadD(row+T)+fwd", payloadD, (ftab, b.pair_gauss)),
    ("payloadE(take ax1)+fwd", payloadE, (ftab, b.pair_gauss)),
    ("fwd_only", fwd_only, (payload,)),
    ("bwd_only", bwd_only, (payload,)),
    ("merge_only", merge_only, (grads0, stage0)),
    ("redsort_only(key+7)", redsort_only, (grads0,)),
    ("reduce_packed_only", reduce_only, (slab_sorted,)),
]:
    timed(nm, rep(body), *args)
