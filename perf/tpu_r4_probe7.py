"""Round-4 probe v7: composition after the elementwise-projection fix,
expand chunk=2048, batched piece sort + tuned multi-reduce.

Baselines (perf/tpu_r4_probe4.py, pre-fix): full_fwd 81.1,
full_fb mono 141.1, pieces4(loop+blk256) 148.0 ms/frame.

Measures at N=1M / C=5.24M:
  * full_fwd, full_fb mono, full_fb pieces8/16 (batched (KP, cp) sort,
    slack 16384, multi-reduce blk=1024);
  * isolated reduce_segments_packed (mono) chunk/blk sweep;
  * isolated reduce_segments_packed_multi kp=16 blk sweep.
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


timed("full_fwd_v7", rep(full_fwd(make_cfg())))
timed("full_fb_mono_v7", rep(full_fb(make_cfg())))
timed("full_fb_pieces8_v7", rep(full_fb(make_cfg(reduce_pieces=8))))
timed("full_fb_pieces16_v7", rep(full_fb(make_cfg(reduce_pieces=16))))

# isolated reduce kernels at C=5.24M, pr=7 packed rows
C = 5_242_880
rng = np.random.default_rng(0)
counts = rng.integers(0, 11, N)
counts = (counts * (C / counts.sum())).astype(np.int64)
starts_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
starts_np[-1] = min(starts_np[-1], C)
gs = jnp.asarray(starts_np)
slab = jnp.asarray(
    rng.integers(-(1 << 30), 1 << 30, (7, C + 1024)), jnp.int32)

for ch, blk in ((512, 128), (512, 256), (1024, 128), (1024, 256)):
    def red(seed, s, ch=ch, blk=blk):
        ss = s + (0 * seed).astype(jnp.int32)
        per = rp.reduce_segments_packed(ss, gs, N, chunk=ch, blk=blk)
        return jnp.sum(per[:, ::997])
    timed(f"reduce_mono_ch{ch}_blk{blk}", rep(red), slab)

kp = 16
cp = C // kp + 1024
pieces = jnp.asarray(
    rng.integers(-(1 << 30), 1 << 30, (kp, 7, cp + 512)), jnp.int32)
pcounts = rng.integers(0, 11, (kp, N))
pcounts = (pcounts * (cp / np.maximum(pcounts.sum(1, keepdims=True), 1))
           ).astype(np.int64)
pstarts = np.concatenate(
    [np.zeros((kp, 1), np.int64), np.cumsum(pcounts, 1)], 1)
pstarts = jnp.asarray(np.minimum(pstarts, cp).astype(np.int32))

for blk in (256, 1024, 2048):
    def redm(seed, p, blk=blk):
        pp = p + (0 * seed).astype(jnp.int32)
        per = rp.reduce_segments_packed_multi(pp, pstarts, N, blk=blk)
        return jnp.sum(per[:, ::997])
    timed(f"reduce_multi16_blk{blk}", rep(redm), pieces)
