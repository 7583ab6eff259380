"""Chunk-statistics probe: how many K-chunks the kernels actually sweep
at the bench scene (total CSR chunks vs replayed-to-last-contributor),
to attribute per-chunk cost. Runs on the TPU (or CPU, slowly).

CAVEAT (found the hard way): `tfin > 1e-4` does NOT mean "pixel never
terminated" — terminated pixels keep T slightly above 1e-4 because the
tripping Gaussian is excluded from compositing. The forward's real
processed-chunk count is best measured by timing with the early-exit
condition disabled (fwd kernel 7.05 ms with vs ~17.2 ms without at the
bench scene => ~59% of chunk-visits skipped)."""
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

N = 100_000; W, H = 1024, 576
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.5)
cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
viewmat = cam.viewmat()
fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
opac = jax.nn.sigmoid(params.opacities)
feats = jnp.concatenate([jnp.ones((N, 3)) * 0.5, params.normals], -1)
cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                        tile_block=16, pair_capacity=1_572_864,
                        backend="pallas")
K = cfg.chunk


@jax.jit
def stats(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
    b = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy, validf)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    f = allf.shape[-1]
    opac_m = jnp.where(validf > 0.5, opac, 0.0)
    fields = jnp.concatenate([p.means2d, p.conics, opac_m[:, None], allf,
                              jnp.zeros((N, rp.PW - 6 - f))], -1)
    fields_s = jnp.concatenate([fields[b.order], jnp.zeros((1, rp.PW))])
    payload = fields_s[b.pair_gauss].T
    out_t, tfin_t, last_t = rp.forward_tiles(
        payload, b.starts, b.counts, cfg.n_tiles_padded, f,
        cfg.tile_size, cfg.tiles_x, cfg.chunk)
    starts = b.starts[:-1]
    a0 = (starts // K) * K
    hoff = starts - a0
    nchunks = jnp.where(b.counts > 0, -(-(hoff + b.counts) // K), 0)
    ml = jnp.max(last_t[:, 0, :], axis=1)  # (T,)
    nch_eff = jnp.where(ml < 0, 0, (hoff + ml + K) // K)
    return (jnp.sum(b.counts), jnp.sum(nchunks), jnp.sum(nch_eff),
            jnp.sum(jnp.max(tfin_t[:, 0, :], axis=1) > 1e-4))


pairs, total_ch, replay_ch, unsat_tiles = [np.asarray(x) for x in
                                           stats(params.means)]
print(f"pairs={pairs}  csr_chunks={total_ch}  replayed_chunks={replay_ch}"
      f"  tiles_with_unsaturated_pixels={unsat_tiles}/{cfg.n_tiles}",
      flush=True)
