"""Isolate Mosaic-vs-interpret divergence in backward_tiles (dense CSR).

Runs ONE real forward (Mosaic) to get residuals, then executes
backward_tiles on identical inputs twice — real Mosaic and forced
interpreter — and prints per-row max diffs of the merged slab and the
staged head windows. Pure kernel probe; no custom_vjp plumbing.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

N = 5000; W, H = 256, 256
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.2)
cam = ring_cameras(1, width=W, img_height=H, focal=300.0)[0]
viewmat = cam.viewmat()
fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
opac = jax.nn.sigmoid(params.opacities)
feats = jnp.concatenate([jnp.ones((N, 3)) * 0.5, params.normals], -1)
cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                        tile_block=16, pair_capacity=1 << 17,
                        backend="pallas")

proj = jax.jit(lambda m: project_gaussians(
    m, params.quats, jnp.exp(params.scales), viewmat, fx, fy, cx, cy, W, H
))(params.means)
allf = jnp.concatenate([feats, proj.depths[:, None]], -1)
f = int(allf.shape[-1])
validf = (proj.valid & (alive > 0.5)).astype(jnp.float32)
sink = jnp.zeros_like(proj.means2d)


def _fwd_residuals_impl(means2d, conics, op, fts):
    (img, a), res = R._raster_fwd(
        cfg, means2d, conics, op, fts, sink, proj.depths, proj.radii_xy,
        validf)
    binned, payload, tfin_t, last_t, n = res
    return img, a, binned, payload, tfin_t, last_t


def fwd_residuals(*args):
    # fresh jit per call: pallas_call bakes the interpret flag at trace
    # time, so a cached executable would make the Mosaic-vs-interpret
    # comparison vacuous.
    return jax.jit(_fwd_residuals_impl)(*args)


img, a, binned, payload, tfin_t, last_t = fwd_residuals(
    proj.means2d, proj.conics, opac, allf)
print("forward done; total_pairs:", int(binned.total_pairs), flush=True)

# Forward residual check: real Mosaic vs interpreter on the SAME inputs.
_orig_interp = rp._interpret
rp._interpret = lambda: True
try:
    img_i, a_i, binned_i, payload_i, tfin_i, last_i = fwd_residuals(
        proj.means2d, proj.conics, opac, allf)
finally:
    rp._interpret = _orig_interp
for nm, rr, ii in [("img", img, img_i), ("alpha", a, a_i),
                   ("payload", payload, payload_i),
                   ("tfin", tfin_t, tfin_i), ("last", last_t, last_i)]:
    d = np.abs(np.asarray(rr, np.float64) - np.asarray(ii, np.float64))
    print(f"fwd {nm}: max|d|={d.max():.3e} n_bad={(d > 1e-4).sum()}",
          flush=True)
if int(np.abs(np.asarray(last_t, np.int64)
              - np.asarray(last_i, np.int64)).max()) > 0:
    lt, li = np.asarray(last_t), np.asarray(last_i)
    bad = np.argwhere(lt != li)
    print("  last mismatches:", bad.shape[0], "first:", bad[:5].tolist())
    for b in bad[:5]:
        print(f"   tile {b[0]} pix {b[2]}: real={lt[tuple(b)]} "
              f"interp={li[tuple(b)]}")

rng = np.random.default_rng(0)
g_img = jnp.asarray(rng.normal(size=(H, W, f)).astype(np.float32))
g_alp = jnp.asarray(rng.normal(size=(H, W, 1)).astype(np.float32))
g_out_t = jnp.transpose(R._image_to_tiles(cfg, g_img), (0, 2, 1))
g_alpha_t = jnp.transpose(R._image_to_tiles(cfg, g_alp), (0, 2, 1))


def run_bwd(pack):
    @jax.jit
    def go():
        grads, stage, nch = rp.backward_tiles(
            payload, binned.starts, binned.counts, g_out_t, g_alpha_t,
            tfin_t, last_t, cfg.n_tiles_padded, f, cfg.tile_size,
            cfg.tiles_x, cfg.chunk, pack_grads=pack)
        k = cfg.chunk
        nwin = grads.shape[1] // k
        w0 = binned.starts[:-1] // k
        merged = (grads.reshape(grads.shape[0], nwin, k)
                  .at[:, w0].add(jnp.moveaxis(stage, 0, 1))
                  .reshape(grads.shape[0], nwin * k))
        return grads, stage, merged, nch
    return jax.tree.map(np.asarray, go())


def decode_np(packed):
    u = np.ascontiguousarray(packed).view(np.uint32)
    hi = (u & np.uint32(0xFFFF0000)).view(np.float32)
    lo = (u << np.uint32(16)).view(np.float32)
    out = np.empty((2 * packed.shape[0], packed.shape[1]), np.float32)
    out[0::2] = hi
    out[1::2] = lo
    return out


real = run_bwd(True)
orig = rp._interpret
rp._interpret = lambda: True
try:
    interp = run_bwd(True)
finally:
    rp._interpret = orig
mr = decode_np(real[2])
mi = decode_np(interp[2])
d = np.abs(mr - mi)
print(f"merged DECODED: max|d|={d.max():.3e} n_bad={(d > 1e-4).sum()}",
      flush=True)

# Full sortpack reduction on the REAL merged slab: real vs interpret
# reduce kernel, and vs a segment-sum ground truth from the decoded slab.
rows_used = (6 + f + 1) // 2
merged = jnp.asarray(real[2])


def reduce_path():
    @jax.jit
    def go():
        sorted_out = jax.lax.sort(
            (binned.pair_orig,) + tuple(merged[i] for i in range(rows_used)),
            num_keys=1)
        slab = jnp.stack(sorted_out[1:], axis=0)
        slab = jnp.pad(slab, ((0, 0), (0, 512)))
        per = rp.reduce_segments_packed(slab, binned.gauss_starts, N)
        return per, jnp.stack(sorted_out[1:], axis=0)
    return jax.tree.map(np.asarray, go())


per_real, slab_sorted = reduce_path()
rp._interpret = lambda: True
try:
    per_interp, _ = reduce_path()
finally:
    rp._interpret = orig
d = np.abs(per_real - per_interp)
print(f"reduce real-vs-interp: max|d|={d.max():.3e} n_bad={(d > 1e-3).sum()}",
      flush=True)

# ground truth: decode merged slab, segment-sum by pair_gauss
dec = decode_np(real[2])  # (16, C+k) f32, post-sort pair order
pg = np.asarray(binned.pair_gauss)
gt = np.zeros((dec.shape[0], N + 1), np.float64)
np.add.at(gt.T, pg, dec.T.astype(np.float64))
gt = gt[:, :N]
nlive = 6 + f
per_real = per_real[:, :N]
d2 = np.abs(per_real[:nlive] - gt[:nlive])
print(f"reduce real-vs-segsum_gt: max|d|={d2.max():.3e} "
      f"n_bad={(d2 > 1e-2).sum()}", flush=True)
if d2.max() > 1e-2:
    bad = np.argwhere(d2 > max(1e-2, 0.01 * d2.max()))
    print("  bad field rows:", np.unique(bad[:, 0])[:20])
    print("  bad gaussians:", np.unique(bad[:, 1])[:20])
    gs = np.asarray(binned.gauss_starts)
    bg = np.unique(bad[:, 1])[:5]
    for g in bg:
        print(f"  gauss {g}: range [{gs[g]}, {gs[g+1]})")
