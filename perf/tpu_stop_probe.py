"""
CAVEAT: this probe defines the unsaturated set as tfin > 1e-4, which
OVERESTIMATES it (terminated pixels keep T slightly above 1e-4: the
tripping Gaussian is excluded). Its negative conclusion is therefore an
upper bound on the mechanism, measured vs a too-large unsat set; the
decisive measurement was the fori-vs-while timing A/B (see CLAUDE.md).
Probe: per-tile stop depth from the suffix-AABB-coverage test.

Stop criterion (conservative, semantics-exact): at window w of a tile,
if no REMAINING pair's opacity-aware AABB contains a pixel that is still
unsaturated, the rest of the sweep contributes nothing. Pair supports
within a tile are rank-1 row/col bitmask outer products; the suffix-OR
of (rowbits, colbits) over windows is a superset of the true remaining
coverage. Prints total windows processed under this stop vs the CSR
total vs the ideal (last-contributor) bound."""
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
    payload = fields_s[b.pair_gauss].T
    out_t, tfin_t, last_t = rp.forward_tiles(
        payload, b.starts, b.counts, cfg.n_tiles_padded, f,
        cfg.tile_size, cfg.tiles_x, cfg.chunk)

    t_pad = cfg.n_tiles_padded
    # radii in depth-sorted gaussian order -> per-pair via pair_gauss
    rad_s = jnp.concatenate([p.radii_xy[b.order], jnp.zeros((1, 2))])
    rxy = rad_s[b.pair_gauss[:C]]  # (C, 2)
    mx = payload[0, :C]
    my = payload[1, :C]

    pos = jnp.arange(C, dtype=jnp.int32)
    tile = jnp.clip(jnp.searchsorted(b.starts, pos, side="right") - 1,
                    0, t_pad - 1).astype(jnp.int32)
    intile = pos - b.starts[tile]
    live = intile < b.counts[tile]
    txf = (tile % cfg.tiles_x).astype(jnp.float32) * TS
    tyf = (tile // cfg.tiles_x).astype(jnp.float32) * TS
    # tile-local pixel-index AABB (pixel centers at +0.5)
    x0 = jnp.clip(jnp.floor(mx - rxy[:, 0] - txf + 0.5).astype(jnp.int32),
                  0, TS - 1)
    x1 = jnp.clip(jnp.floor(mx + rxy[:, 0] - txf - 0.5).astype(jnp.int32) + 1,
                  1, TS)
    y0 = jnp.clip(jnp.floor(my - rxy[:, 1] - tyf + 0.5).astype(jnp.int32),
                  0, TS - 1)
    y1 = jnp.clip(jnp.floor(my + rxy[:, 1] - tyf - 0.5).astype(jnp.int32) + 1,
                  1, TS)
    bit = jnp.arange(TS, dtype=jnp.int32)[None, :]
    rowbits = jnp.sum(jnp.where((y0[:, None] <= bit) & (bit < y1[:, None]),
                                1 << bit, 0), axis=1)
    colbits = jnp.sum(jnp.where((x0[:, None] <= bit) & (bit < x1[:, None]),
                                1 << bit, 0), axis=1)
    rowbits = jnp.where(live, rowbits, 0)
    colbits = jnp.where(live, colbits, 0)

    # per-(tile, in-tile-chunk) OR, then suffix OR along the chunk axis.
    MAXW = 128
    starts = b.starts[:-1]
    a0 = (starts // K) * K
    hoff = starts - a0
    nch = jnp.where(b.counts > 0, -(-(hoff + b.counts) // K), 0)
    inwin = jnp.clip((intile + hoff[tile]) // K, 0, MAXW - 1)
    segid = tile * MAXW + inwin  # (C,) — 2304*128 segments

    def seg_or(bits):
        acc = jnp.zeros((t_pad * MAXW,), jnp.int32)
        for i in range(TS):
            plane = jax.ops.segment_max(((bits >> i) & 1), segid,
                                        num_segments=t_pad * MAXW)
            acc = acc + (plane << i)
        return acc.reshape(t_pad, MAXW)

    wrow = seg_or(rowbits)
    wcol = seg_or(colbits)

    def suf_or(x):
        return jnp.flip(jax.lax.associative_scan(
            jnp.bitwise_or, jnp.flip(x, axis=1), axis=1), axis=1)

    srow = suf_or(wrow)  # (T, MAXW) suffix coverage rowbits
    scol = suf_or(wcol)

    # unsaturated pixel planes per tile (final state)
    u = (tfin_t[:, 0, :] > rp.TRANSMITTANCE_EPS).reshape(t_pad, TS, TS)
    rmask = ((srow[:, :, None] >> jnp.arange(TS)[None, None, :]) & 1)
    cmask = ((scol[:, :, None] >> jnp.arange(TS)[None, None, :]) & 1)
    inter = jnp.einsum("twy,twx,tyx->tw", rmask.astype(jnp.float32),
                       cmask.astype(jnp.float32), u.astype(jnp.float32))
    can_contribute = inter > 0  # (T, MAXW) at chunk start

    wi = jnp.arange(MAXW, dtype=jnp.int32)[None, :]
    in_tile = wi < nch[:, None]
    proc = jnp.sum((in_tile & can_contribute).astype(jnp.int32) *
                   jnp.cumprod(jnp.where(in_tile, can_contribute, True)
                               .astype(jnp.int32), axis=1))
    ml = jnp.max(last_t[:, 0, :], axis=1)
    nch_eff = jnp.where(ml < 0, 0, (hoff + ml + K) // K)
    return jnp.sum(nch), proc, jnp.sum(nch_eff)


total, proc, ideal = [np.asarray(x) for x in probe(params.means)]
print(f"csr_windows={total}  processed_with_aabb_stop={proc}  "
      f"ideal_last_bound={ideal}", flush=True)
