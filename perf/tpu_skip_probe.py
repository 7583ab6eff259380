"""
CAVEAT: this probe defines the unsaturated set as tfin > 1e-4, which
OVERESTIMATES it (terminated pixels keep T slightly above 1e-4: the
tripping Gaussian is excluded). Its negative conclusion is therefore an
upper bound on the mechanism, measured vs a too-large unsat set; the
decisive measurement was the fori-vs-while timing A/B (see CLAUDE.md).
Probe: how many forward 128-lane windows could be skipped by testing
each pair's minimum sigma over the tile's UNSATURATED-pixel bounding box
(computed from the final transmittance — accurate for the deep chunks
past `last`, which are the waste)."""
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
TS = cfg.tile_size
C = cfg.pair_capacity


@jax.jit
def probe(m):
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
    payload = fields_s[b.pair_gauss].T  # (16, C+K)
    out_t, tfin_t, last_t = rp.forward_tiles(
        payload, b.starts, b.counts, cfg.n_tiles_padded, f,
        cfg.tile_size, cfg.tiles_x, cfg.chunk)

    t_pad = cfg.n_tiles_padded
    # Unsaturated-pixel bbox per tile (tile-local pixel-center coords).
    u = tfin_t[:, 0, :] > rp.TRANSMITTANCE_EPS  # (T, P)
    pidx = jnp.arange(TS * TS)
    lx = (pidx % TS).astype(jnp.float32) + 0.5
    ly = (pidx // TS).astype(jnp.float32) + 0.5
    big = jnp.float32(1e9)
    x0u = jnp.min(jnp.where(u, lx[None], big), axis=1)   # (T,)
    x1u = jnp.max(jnp.where(u, lx[None], -big), axis=1)
    y0u = jnp.min(jnp.where(u, ly[None], big), axis=1)
    y1u = jnp.max(jnp.where(u, ly[None], -big), axis=1)
    bbox_area = jnp.mean(jnp.where(
        x1u > -big, (x1u - x0u + 1) * (y1u - y0u + 1), 0.0)) / (TS * TS)

    pos = jnp.arange(C, dtype=jnp.int32)
    tile = jnp.clip(jnp.searchsorted(b.starts, pos, side="right") - 1,
                    0, t_pad - 1).astype(jnp.int32)
    intile = pos - b.starts[tile]
    live = intile < b.counts[tile]
    mx = payload[0, :C]
    my = payload[1, :C]
    pa = jnp.maximum(payload[2, :C], 1e-12)
    pb = payload[3, :C]
    pc = jnp.maximum(payload[4, :C], 1e-12)
    op = payload[5, :C]
    txf = (tile % cfg.tiles_x).astype(jnp.float32) * TS
    tyf = (tile // cfg.tiles_x).astype(jnp.float32) * TS
    ax0 = txf + x0u[tile] - mx
    ax1 = txf + x1u[tile] - mx
    ay0 = tyf + y0u[tile] - my
    ay1 = tyf + y1u[tile] - my

    def sig(dx, dy):
        return 0.5 * (pa * dx * dx + pc * dy * dy) + pb * dx * dy

    smin = jnp.minimum(
        jnp.minimum(sig(ax0, jnp.clip(-pb * ax0 / pc, ay0, ay1)),
                    sig(ax1, jnp.clip(-pb * ax1 / pc, ay0, ay1))),
        jnp.minimum(sig(jnp.clip(-pb * ay0 / pa, ax0, ax1), ay0),
                    sig(jnp.clip(-pb * ay1 / pa, ax0, ax1), ay1)))
    inside = (ax0 <= 0.0) & (0.0 <= ax1) & (ay0 <= 0.0) & (0.0 <= ay1)
    smin = jnp.where(inside, 0.0, smin)
    has_unsat = x1u[tile] > -big
    alive_pair = live & has_unsat & (
        smin <= jnp.log(jnp.maximum(op, 1e-12) * 255.0) + 1e-3)

    # windows == kernel chunk DMAs up to head alignment
    win = pos // K
    nwin = C // K
    win_alive = jax.ops.segment_sum(alive_pair.astype(jnp.int32), win,
                                    num_segments=nwin) > 0
    win_live = jax.ops.segment_sum(live.astype(jnp.int32), win,
                                   num_segments=nwin) > 0
    return (jnp.sum(live), jnp.sum(alive_pair), jnp.sum(win_live),
            jnp.sum(win_alive), bbox_area)


vals = [np.asarray(x) for x in probe(params.means)]
print(f"live_pairs={vals[0]}  alive_vs_unsat_bbox={vals[1]}  "
      f"windows_live={vals[2]}  windows_alive={vals[3]}  "
      f"mean_unsat_bbox_frac={vals[4]:.3f}", flush=True)
