"""Round-4 probe v3: expand double-buffer A/B, piecewise-sort scaling.

(a) streamed expand after the DMA double-buffer fix (was 17.3 ms);
(b) XLA sort key+7 at C, C/2, C/4, C/8 on the REAL slab — the measured
    n^1.56 superlinearity predicts 4 quarter-sorts ≈ 20 ms vs 44;
(c) end-to-end piecewise prototype: 4 x (slice + sort + reduce) + sum.
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

# (a) expand after the double-buffer fix
gs = b.gauss_starts
vals5 = jnp.zeros((5, N), jnp.int32) + jnp.arange(N, dtype=jnp.int32)[None, :]
def expand_only(seed, v):
    vv = v + (0 * seed).astype(jnp.int32)
    acc = rp.expand_segments(vv, gs, C)
    return jnp.sum(acc[:, ::997]).astype(jnp.float32)
timed("expand5_stream_DB", rep(expand_only), vals5)

# (b) sort key+7 scaling with length (REAL key/grad distributions)
for frac in (1, 2, 4, 8):
    ln = C // frac
    def body(seed, key_, rows_, ln=ln):
        k_ = jax.lax.dynamic_slice(key_, (0,), (ln,))
        k_ = k_ + (0 * seed).astype(jnp.int32)
        rs = jax.lax.dynamic_slice(rows_, (0, 0), (7, ln))
        outs = jax.lax.sort((k_,) + tuple(rs[i] for i in range(7)),
                            num_keys=1)
        return sum(jnp.sum(o[::997]) for o in outs[1:]).astype(jnp.float32)
    timed(f"sort_key+7_C/{frac}", rep(body), b.pair_orig, grads0)

# (c) 4-piece prototype: slice at pair-balanced tile boundaries,
# sort each piece, reduce each piece over piece-local segment starts,
# sum the four (GW, N) results.
KP = 4
CP = C // KP + 8192  # static piece capacity (boundaries are pair-balanced)

def piecewise(seed, grads, key_):
    g = grads + (0 * seed).astype(jnp.int32)
    # pad so the LAST piece's static-size slice stays in bounds
    g = jnp.pad(g, ((0, 0), (0, CP)))
    key_ = jnp.pad(key_, (0, CP), constant_values=N)
    # piece boundaries: tile whose cumulative pair count crosses j*C/KP
    targets = jnp.arange(1, KP, dtype=jnp.int32) * (C // KP)
    tj = jnp.searchsorted(b.starts, targets, side="left").astype(jnp.int32)
    tj = jnp.concatenate([jnp.zeros((1,), jnp.int32), tj,
                          jnp.full((1,), cfg.n_tiles_padded, jnp.int32)])
    pj = b.starts[tj]  # (KP+1,) piece slab offsets
    # per-ORIGINAL-gaussian counts below tile B (elementwise closed form)
    ts = 16.0
    m2d = p.means2d
    rad = p.radii_xy
    x0 = jnp.clip(jnp.floor((m2d[:, 0] - rad[:, 0]) / ts).astype(jnp.int32),
                  0, cfg.tiles_x)
    x1 = jnp.clip(jnp.floor((m2d[:, 0] + rad[:, 0]) / ts).astype(jnp.int32)
                  + 1, 0, cfg.tiles_x)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - rad[:, 1]) / ts).astype(jnp.int32),
                  0, cfg.tiles_y)
    y1 = jnp.clip(jnp.floor((m2d[:, 1] + rad[:, 1]) / ts).astype(jnp.int32)
                  + 1, 0, cfg.tiles_y)
    ok = (p.valid & (alive > 0.5))
    w = jnp.where(ok, jnp.maximum(x1 - x0, 0), 0)
    h = jnp.maximum(y1 - y0, 0)

    def cnt_lt(bnd):  # tiles of each bbox with id < bnd
        rb = bnd // cfg.tiles_x
        cb = bnd % cfg.tiles_x
        full = w * jnp.clip(jnp.minimum(y1, rb) - y0, 0, None)
        part = jnp.where((y0 <= rb) & (rb < y1),
                         jnp.clip(jnp.minimum(x1, cb) - x0, 0, None), 0)
        return (full + jnp.where(w > 0, part, 0)).astype(jnp.int32)

    acc = None
    for j in range(KP):
        cj = cnt_lt(tj[j + 1]) - cnt_lt(tj[j])
        startsj = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(cj).astype(jnp.int32)])
        lenj = pj[j + 1] - pj[j]
        sl = jax.lax.dynamic_slice(g, (0, pj[j]), (7, CP))
        kj = jax.lax.dynamic_slice(key_, (pj[j],), (CP,))
        lane = jnp.arange(CP, dtype=jnp.int32)
        kj = jnp.where(lane < lenj, kj, N)
        outs = jax.lax.sort((kj,) + tuple(sl[i] for i in range(7)),
                            num_keys=1)
        slab = jnp.pad(jnp.stack(outs[1:], 0), ((0, 0), (0, 512)))
        per = rp.reduce_segments_packed(slab, startsj, N, blk=256)
        acc = per if acc is None else acc + per
    return jnp.sum(acc[:, ::97])

timed(f"piecewise_sort_reduce_k{KP}", rep(piecewise), grads0, b.pair_orig)

# reference: current monolithic chain (sort + reduce only)
def mono(seed, grads, key_):
    g = grads + (0 * seed).astype(jnp.int32)
    outs = jax.lax.sort((key_,) + tuple(g[i] for i in range(7)), num_keys=1)
    slab = jnp.pad(jnp.stack(outs[1:], 0), ((0, 0), (0, 512)))
    per = rp.reduce_segments_packed(slab, b.orig_starts, N, blk=256)
    return jnp.sum(per[:, ::97])
timed("monolithic_sort_reduce", rep(mono), grads0, b.pair_orig)
