"""Round-4 probe v2: gather byte-vs-row bound, sort row-slope at 5.24M,
reduce blk granularity, binning internals, real backward-chain timing.

Decides: (a) can the payload table shrink (gather byte-bound?) or the
reduction sort split into sort(key,pos)+gather (only wins if gathers are
byte-bound); (b) what the XLA sort actually costs per row at C=5.24M;
(c) reduce_segments_packed block-granularity sweet spot; (d) which part
of binning's ~26 ms is sort vs expand vs histogram.
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
C = cfg.pair_capacity

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

p, validf, order, fields_s, b, ftab, payload = jax.jit(build_prefix)()
jax.block_until_ready(payload)

out_t, tfin_t, last_t = jax.jit(
    lambda pay: rp.forward_tiles(pay, b.starts, b.counts,
                                 cfg.n_tiles_padded, F, cfg.tile_size,
                                 cfg.tiles_x, cfg.chunk))(payload)
g_out_t = jnp.ones_like(out_t)
g_alpha_t = jnp.ones_like(tfin_t)
grads0, stage0, _ = jax.jit(lambda pay: rp.backward_tiles(
    pay, b.starts, b.counts, g_out_t, g_alpha_t, tfin_t, last_t,
    cfg.n_tiles_padded, F, cfg.tile_size, cfg.tiles_x, cfg.chunk,
    pack_grads=True))(payload)
jax.block_until_ready(grads0)

# ---- (a) materialized gather cost vs table row width ----
# Forced materialization: cumsum along the minor axis then a strided sum
# (the cumsum cannot be elided and costs one bandwidth pass itself).
def gather_w(width):
    tab = ftab[:, :width] if width <= 16 else jnp.tile(ftab, (1, 2))

    def body(seed, pg):
        t = tab + seed * 1e-9
        g = t[pg]  # (C, width)
        # full sum: every row must be visited (no strided elision); the
        # gather may fuse with the reduce, which is fine — the question
        # is whether its cost scales with row WIDTH or row COUNT.
        return jnp.sum(g)
    return body

for wdt in (2, 4, 8, 16):
    timed(f"gatherC_w{wdt}", rep(gather_w(wdt)), b.pair_gauss)

# control: the same cumsum consumption on a PREBUILT (C, 16) array —
# isolates the consumption cost from the gather cost
pre16 = jnp.asarray(np.zeros((C + K, 16), np.float32))
def consume_only(seed, x):
    return jnp.sum(x + seed * 1e-9)
timed("consume_ctrl_w16", rep(consume_only), pre16)

# MATERIALIZED narrow gather: (N+1, 8) table -> (8, C) payload fed to a
# real Pallas kernel (reduce_segments with degenerate starts) so the
# gather + transpose cannot fuse away. Compare against payloadD's 33 ms
# w16 materialized cost to settle byte-vs-row bound for the REAL path.
tab8 = ftab[:, :8]
deg_starts = jnp.concatenate([
    jnp.arange(N, dtype=jnp.int32) * 0 + jnp.minimum(
        jnp.arange(N, dtype=jnp.int32) * 5, C), jnp.asarray([C], jnp.int32)])
def gather8_material(seed, pg):
    t = tab8 + seed * 1e-9
    g = t[pg].T  # (8, C + K) materialized for the kernel DMA
    g = jnp.pad(g, ((0, 0), (0, 512 - K)))
    per = rp.reduce_segments(g, deg_starts, N)
    return jnp.sum(per[:, ::97])
timed("gather8_materialized+reduce", rep(gather8_material), b.pair_gauss)
def gather16_material(seed, pg):
    t = ftab + seed * 1e-9
    g = t[pg].T  # (16, C + K)
    g = jnp.pad(g, ((0, 0), (0, 512 - K)))
    per = rp.reduce_segments(g, deg_starts, N)
    return jnp.sum(per[:, ::97])
timed("gather16_materialized+reduce", rep(gather16_material), b.pair_gauss)

# ---- (b) sort row-slope at 5.24M (real key distribution) ----
rows_i = grads0  # (8, C + K) int32 real bf16-packed grads
for nr in (1, 3, 7):
    def body(seed, key_, rows_, nr=nr):
        k_ = key_ + (0 * seed).astype(jnp.int32)
        outs = jax.lax.sort((k_,) + tuple(rows_[i] for i in range(nr)),
                            num_keys=1)
        return sum(jnp.sum(o[::997]) for o in outs[1:]).astype(jnp.float32)
    timed(f"sortC_key+{nr}", rep(body), b.pair_orig, rows_i)

# sort(key, iota) + minor-axis take of the 8-row slab by sorted positions
def sort_then_take(seed, key_, rows_):
    k_ = key_ + (0 * seed).astype(jnp.int32)
    pos = jnp.arange(k_.shape[0], dtype=jnp.int32)
    _, spos = jax.lax.sort((k_, pos), num_keys=1)
    g = jnp.take(rows_, spos, axis=1)  # (8, C)
    return jnp.sum(jnp.cumsum(g, axis=0)[-1][::997]).astype(jnp.float32)
timed("sortC_key+pos_then_take8", rep(sort_then_take), b.pair_orig, rows_i)

# ---- (c) reduce_segments_packed block granularity ----
slab_sorted = jax.jit(lambda g: jnp.pad(jnp.stack(jax.lax.sort(
    (b.pair_orig,) + tuple(g[i] for i in range(7)), num_keys=1)[1:], 0),
    ((0, 0), (0, 512))))(grads0)
jax.block_until_ready(slab_sorted)

for blk in (128, 256, 512):
    def body(seed, slab, blk=blk):
        s = slab + (0 * seed).astype(jnp.int32)
        per = rp.reduce_segments_packed(s, b.orig_starts, N, blk=blk)
        return jnp.sum(per[:, ::97])
    timed(f"reduce_packed_blk{blk}", rep(body), slab_sorted)

# ---- (d) binning internals ----
gs = b.gauss_starts
vals5 = jnp.zeros((5, N), jnp.int32) + jnp.arange(N, dtype=jnp.int32)[None, :]
def expand_only(seed, v):
    vv = v + (0 * seed).astype(jnp.int32)
    acc = rp.expand_segments(vv, gs, C)
    return jnp.sum(acc[:, ::997]).astype(jnp.float32)
timed("expand5_stream_only", rep(expand_only), vals5)

keys_u = jnp.asarray(
    np.random.default_rng(0).integers(0, (cfg.n_tiles_padded + 1) *
                                      (N + 1) - 1, C, dtype=np.int64)
    .astype(np.uint32))
def pairsort_only(seed, k_, ov):
    kk = k_ + (0 * seed).astype(jnp.uint32)
    ks, ovs = jax.lax.sort((kk, ov), num_keys=1)
    return (jnp.sum(ks[::997]).astype(jnp.float32)
            + jnp.sum(ovs[::997]).astype(jnp.float32))
timed("pairsort_key+1_only", rep(pairsort_only), keys_u,
      b.pair_orig[:C])

def hist_only(seed):
    m2d = fields_s[:, 0:2] + seed * 1e-9
    rad = fields_s[:, 13:15]
    ts = 16
    x0 = jnp.clip(jnp.floor((m2d[:, 0] - rad[:, 0]) / ts).astype(jnp.int32),
                  0, cfg.tiles_x)
    x1 = jnp.clip(jnp.floor((m2d[:, 0] + rad[:, 0]) / ts).astype(jnp.int32)
                  + 1, 0, cfg.tiles_x)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - rad[:, 1]) / ts).astype(jnp.int32),
                  0, cfg.tiles_y)
    y1 = jnp.clip(jnp.floor((m2d[:, 1] + rad[:, 1]) / ts).astype(jnp.int32)
                  + 1, 0, cfg.tiles_y)
    keep = (x1 > x0) & (y1 > y0)
    ty = jnp.arange(cfg.tiles_y, dtype=jnp.int32)[None, :]
    tx = jnp.arange(cfg.tiles_x, dtype=jnp.int32)[None, :]
    a_y = ((y0[:, None] <= ty) & (ty < y1[:, None])
           & keep[:, None]).astype(jnp.float32)
    b_x = ((x0[:, None] <= tx) & (tx < x1[:, None])).astype(jnp.float32)
    c2d = jnp.einsum("gy,gx->yx", a_y, b_x,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(c2d)
timed("hist_matmul_only", rep(hist_only))

# ---- (e) the REAL full backward chain (merge+sort+pad+reduce+tail) ----
def bwd_chain(seed, grads, stage):
    g = grads + (0 * seed).astype(jnp.int32)
    nwin = g.shape[1] // K
    w0 = b.starts[:-1] // K
    g = (g.reshape(g.shape[0], nwin, K)
         .at[:, w0].add(jnp.moveaxis(stage, 0, 1))
         .reshape(g.shape[0], nwin * K))
    sorted_out = jax.lax.sort(
        (b.pair_orig,) + tuple(g[i] for i in range(7)), num_keys=1)
    slab = jnp.stack(sorted_out[1:], axis=0)
    slab = jnp.pad(slab, ((0, 0), (0, 512)))
    per = rp.reduce_segments_packed(slab, b.orig_starts, N)
    out = jnp.concatenate([per[:13], per[-2:]], axis=0)[:, :N].T
    return jnp.sum(out[::97])
timed("bwd_chain_real", rep(bwd_chain), grads0, stage0)
