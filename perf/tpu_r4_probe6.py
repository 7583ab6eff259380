"""Round-4 probe v6: the split payload gather — MEASURED DEAD END.

probe5's barrier-materialized gathers suggested a >32-byte/row cost
cliff (w6: 8.0 / w10: 38.7 / w13: 37.5 ms at C=5.24M). Splitting the
payload into <=8-row gathers from separate tables was then measured
HERE, composed: full_fwd 104.3 (vs 81.1 mono), full_fb 155.6 (vs
141.1) — a large REGRESSION, reverted. The cliff itself is an
artifact of narrow gathers: w5 7.7 but w7/w8 ~30.1 ms, and the split
8+5 pair costs 56.4 ms (two gathers serialize; each pays the full
row-visit cost). Conclusion: one wide gather is the floor — the
~30-38 ms payload gather at C=5.24M cannot be split, narrowed (w13 ==
w16 within noise), or ridden through the sort (CLAUDE.md ledger).
This file is kept as the record; the split code is reverted.
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


cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                        tile_block=16, pair_capacity=5_242_880,
                        backend="pallas")


def full_fwd(seed):
    m = params.means + seed * 1e-9
    p = project_gaussians(m, params.quats, jnp.exp(params.scales),
                          viewmat, fx, fy, cx, cy, W, H, opacities=opac)
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
                             p.valid & (alive > 0.5), cfg,
                             radii=p.radii_xy)
        return jnp.sum(img) + jnp.sum(a)
    return jax.grad(loss)(params.means + seed * 1e-9).sum()


timed("full_fwd_split", rep(full_fwd))
timed("full_fb_split", rep(full_fb))

# isolated width-cliff edge
C = 5_242_880
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, C).astype(np.int32))
table16 = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))
for w in (5, 7, 8):
    def gath(seed, t, ix, w=w):
        rows = t[:, :w][ix]
        rows = jax.lax.optimization_barrier(rows + seed * 0.0)
        return jnp.sum(rows[::1009, 0])
    timed(f"gather_w{w}_barrier", rep(gath), table16, idx)

ta = jnp.asarray(rng.normal(size=(N + 1, 8)).astype(np.float32))
tb = jnp.asarray(rng.normal(size=(N + 1, 5)).astype(np.float32))


def gath_split(seed, a, b, ix):
    ra = jax.lax.optimization_barrier(a[ix] + seed * 0.0)
    rb = jax.lax.optimization_barrier(b[ix] + seed * 0.0)
    return jnp.sum(ra[::1009, 0]) + jnp.sum(rb[::1009, 0])


timed("gather_split8p5_barrier", rep(gath_split), ta, tb, idx)
