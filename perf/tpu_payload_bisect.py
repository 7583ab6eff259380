"""Bisect the +34 ms 'payload' stage delta at N=1M: the isolated
(C,16) gather costs only ~6 ms (tpu_gather_probe), so the pipeline delta
must come from fusion/DCE interactions, the concat, or the transpose."""
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

def timed(name, fn):
    f = jax.jit(fn)
    out = f(jnp.float32(0))
    float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1)) for i in range(3)]
    for o in outs:
        float(np.asarray(o))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms/frame", flush=True)

def rep(body):
    def outer(seed):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32)), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer

def upto_bin(seed):
    m = params.means + seed * 1e-9
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
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
    return b, fields_s

def s_bin_full(seed):
    """binning but consuming BOTH sort outputs (no pair_pos DCE)."""
    b, fields_s = upto_bin(seed)
    return (jnp.sum(b.starts) + jnp.sum(b.pair_gauss[::997])
            + jnp.sum(b.pair_orig[::997])).astype(jnp.float32)

def s_gather_only(seed):
    b, fields_s = upto_bin(seed)
    fields = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW), jnp.float32)])
    rows = fields[b.pair_gauss]  # (C_al, PW), no transpose
    return jnp.sum(rows[::997]) + jnp.sum(b.pair_orig[::997]).astype(jnp.float32)

def s_gather_T(seed):
    b, fields_s = upto_bin(seed)
    fields = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW), jnp.float32)])
    payload = fields[b.pair_gauss].T  # (PW, C_al)
    return jnp.sum(payload[:, ::997]) + jnp.sum(b.pair_orig[::997]).astype(jnp.float32)

def s_gather_T_full(seed):
    """force FULL materialization: sum everything, not a strided sample."""
    b, fields_s = upto_bin(seed)
    fields = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW), jnp.float32)])
    payload = fields[b.pair_gauss].T
    return jnp.sum(payload) + jnp.sum(b.pair_orig[::997]).astype(jnp.float32)

timed("bin (pair_pos consumed)", rep(s_bin_full))
timed("+gather (C,16) no T    ", rep(s_gather_only))
timed("+gather + transpose    ", rep(s_gather_T))
timed("+gather + T, full sum  ", rep(s_gather_T_full))


def s_gather_barrier(seed):
    """optimization_barrier between binning and the gather: force the
    index vector + table to materialize so the gather can't be fused
    into a per-column recompute."""
    b, fields_s = upto_bin(seed)
    fields = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW), jnp.float32)])
    pg, fields = jax.lax.optimization_barrier((b.pair_gauss, fields))
    payload = fields[pg].T
    return jnp.sum(payload[:, ::997]) + jnp.sum(b.pair_orig[::997]).astype(jnp.float32)


def s_gather_barrier_idx(seed):
    """barrier on the index only."""
    b, fields_s = upto_bin(seed)
    fields = jnp.concatenate([fields_s, jnp.zeros((1, rp.PW), jnp.float32)])
    pg = jax.lax.optimization_barrier(b.pair_gauss)
    payload = fields[pg].T
    return jnp.sum(payload[:, ::997]) + jnp.sum(b.pair_orig[::997]).astype(jnp.float32)


timed("+gather, barrier both  ", rep(s_gather_barrier))
timed("+gather, barrier idx   ", rep(s_gather_barrier_idx))
