"""Round-5 probe v1: live-window compaction A/B (compact_frac).

The backward/reduction path pays full C-scale sort cost for pairs the
forward proved dead (past each tile's last contributor). compact_frac
drops dead slab WINDOWS before the reduction sort and appends the
staged head windows to the sort input (no merge scatter), reducing with
the boundary-free key-equality kernel. Expected from the roofline:
-10..-20 ms/frame at N=1M (sort 46 -> ~24 at ~55% live + merge -4).

Also prints the measured live-window fraction at both bench scales so
the static budget (compact_frac default) is set from data.
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

    def grads(cfg):
        def one(mm):
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
            return jax.grad(loss)(mm)
        return np.asarray(jax.jit(one)(params.means))

    def live_fraction(cfg):
        # replicate the forward + liveness mask to report live windows
        def f(mm):
            p = project_gaussians(mm, params.quats, jnp.exp(params.scales),
                                  viewmat, fx, fy, cx, cy, W, H,
                                  opacities=opac)
            allf = jnp.concatenate([feats, p.depths[:, None]], -1)
            validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
            (img, a), res = R._raster_fwd(
                cfg, p.means2d, p.conics, opac, allf,
                jnp.zeros_like(p.means2d), p.depths, p.radii_xy, validf)
            binned, payload, tfin_t, last_t, nn = res
            k = cfg.chunk
            nwin = payload.shape[1] // k
            t_pad = cfg.n_tiles_padded
            pp = cfg.tile_size ** 2
            ml = jnp.max(last_t.reshape(t_pad, pp), axis=1)
            lc = jnp.minimum(ml + 1, binned.counts)
            s = binned.starts[:-1]
            has = (lc > 0).astype(jnp.int32)
            w0 = s // k
            w_hi = (s + lc + k - 1) // k
            mark = jnp.zeros((nwin + 1,), jnp.int32)
            mark = mark.at[w0].add(has).at[w_hi].add(-has)
            live_w = jnp.cumsum(mark[:-1]) > 0
            return jnp.sum(live_w.astype(jnp.int32)), nwin
        nl, nwin = jax.jit(f)(params.means)
        print(f"  live windows: {int(nl)} / {nwin} "
              f"({int(nl) / nwin:.3f})", flush=True)

    return make_cfg, full_fb, grads, live_fraction


for label, n, ss, cap in (
    ("N=100k", 100_000, 0.0, 1_441_792),
    ("N=1M", 1_000_000, -0.7675284, 5_242_880),
):
    print(f"--- {label} ---", flush=True)
    make_cfg, full_fb, grads, live_fraction = scene(n, ss, cap)
    live_fraction(make_cfg())
    base = timed(f"{label} fb_legacy", rep(full_fb(make_cfg())))
    g0 = grads(make_cfg())
    for frac in (1.0, 0.625, 0.5):
        dt = timed(f"{label} fb_compact{frac}",
                   rep(full_fb(make_cfg(compact_frac=frac))))
        g1 = grads(make_cfg(compact_frac=frac))
        rel = float(np.max(np.abs(g1 - g0)) / (np.max(np.abs(g0)) + 1e-8))
        print(f"  grad rel vs legacy: {rel:.2e}  delta {dt - base:+.2f} ms",
              flush=True)
