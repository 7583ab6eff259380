"""Round-5 probe v4: fwd/bwd kernel overhead split + null-body floor.

ROOFLINE names the fwd kernel at ~12 ms vs a ~7 ms last-contributor
bound at N=1M and the bwd at ~13.5 vs ~9. Candidate explanation: with
only ~4.6k live chunk-visits (live fraction 0.112) the 2304 per-tile
PROGRAMS' fixed costs (startup, scalar reads, output writes, first-DMA
latency not hidden) dominate over the compute body. Measure:

  fwd_full     — forward_tiles as shipped
  fwd_null     — same grid/DMA structure, compute body replaced by a
                 trivial reduction (program+DMA floor)
  bykey_iso    — reduce_segments_bykey isolated at the compacted length
                 (for the post-compaction ROOFLINE row)

If fwd_null ~= fwd_full - body_estimate, multi-tile-per-program
batching is the lever; if fwd_null << fwd_full, the body dominates and
the kernels are at their measured floor.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops import rasterize as R
from dnsplatter_tpu.ops import rasterize_pallas as rp

W, H = 1024, 576
REPS = 8


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(jnp.sum(out)))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jnp.sum(o)))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer


def make_null_fwd(k: int, tile: int, tiles_x: int, n_feats: int):
    """forward_tiles' grid/DMA skeleton with the compute body stripped."""
    p = tile * tile

    def kernel(starts_ref, counts_ref, payload_hbm, out_ref, pay_vmem, sems):
        t = pl.program_id(0)
        start = starts_ref[t]
        cnt = counts_ref[t]
        a0 = pl.multiple_of((start // k) * k, k)
        hoff = start - a0
        nchunks = jnp.where(cnt > 0, pl.cdiv(hoff + cnt, k), 0)

        def dma(slot, ci):
            return pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(a0 + ci * k, k)],
                pay_vmem.at[slot], sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        def body(ci, acc):
            slot = ci % 2

            @pl.when(ci + 1 < nchunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(slot, ci).wait()
            return acc + jnp.sum(pay_vmem[slot][0:1, :], axis=1,
                                 keepdims=True)

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((1, 1), jnp.float32)
        )
        out_ref[0] = jnp.broadcast_to(acc, (1, n_feats, p))[0]

    return kernel


def setup(n, scale_shift, capacity, frac):
    params, alive = make_gt_gaussians(jax.random.PRNGKey(0), n, extent=1.5,
                                      scale_shift=scale_shift)
    cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
    viewmat = cam.viewmat()
    opac = jax.nn.sigmoid(params.opacities)
    feats = jnp.concatenate([jnp.ones((n, 3)) * 0.5, params.normals], -1)
    cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                            tile_block=16, pair_capacity=capacity,
                            backend="pallas", sort_scheme="depthq",
                            compact_frac=frac)

    @jax.jit
    def build(mm):
        p = project_gaussians(mm, params.quats, jnp.exp(params.scales),
                              viewmat, float(cam.fx), float(cam.fy),
                              float(cam.cx), float(cam.cy), W, H,
                              opacities=opac)
        allf = jnp.concatenate([feats, p.depths[:, None]], -1)
        validf = (p.valid & (alive > 0.5)).astype(jnp.float32)
        opm = jnp.where(validf > 0.5, opac, 0.0)
        fields_s = jnp.concatenate(
            [p.means2d, p.conics, opm[:, None], allf], axis=-1)
        binned = R.bin_gaussians(cfg, p.means2d, p.depths, p.radii_xy,
                                 validf, conics=p.conics, opacities=opac)
        pw = fields_s.shape[1]  # 6 + F
        pw_pad = -(-pw // 8) * 8
        fields = jnp.concatenate(
            [fields_s, jnp.zeros((1, pw), jnp.float32)])
        rows = fields[binned.pair_gauss]
        payload = jnp.pad(rows, ((0, 0), (0, pw_pad - pw))).T
        return payload, binned.starts, binned.counts

    payload, starts, counts = build(params.means)
    payload = jax.device_put(payload)
    return cfg, payload, starts, counts


for label, n, ss, cap, frac in (
    ("1M", 1_000_000, -0.7675284, 5_242_880, 0.2),
    ("100k", 100_000, 0.0, 1_441_792, 0.37),
):
    print(f"--- {label} ---", flush=True)
    cfg, payload, starts, counts = setup(n, ss, cap, frac)
    t_pad = cfg.n_tiles_padded
    f = 7

    def fwd_full(seed, payload, starts, counts):
        out, tfin, last = rp.forward_tiles(
            payload + seed * 0.0, starts, counts, t_pad, f, 16,
            cfg.tiles_x, 128)
        return jnp.sum(tfin)

    timed(f"{label} fwd_full", rep(fwd_full), payload, starts, counts)

    nullk = make_null_fwd(128, 16, cfg.tiles_x, f)

    def fwd_null(seed, payload, starts, counts):
        (out,) = pl.pallas_call(
            nullk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(t_pad,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((1, f, 256),
                                        lambda t, s1, s2: (t, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((2, payload.shape[0], 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((t_pad, f, 256), jnp.float32)],
        )(starts, counts, payload + seed * 0.0)
        return jnp.sum(out[:, 0, 0])

    timed(f"{label} fwd_null", rep(fwd_null), payload, starts, counts)
