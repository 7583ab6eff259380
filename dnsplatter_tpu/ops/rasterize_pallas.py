"""Pallas TPU kernels for the tiled rasterizer hot loop.

The XLA-composed rasterizer in ops/rasterize.py is the reference/fallback
path; these kernels replace its per-tile compositing sweep (forward and
backward) with hand-written Pallas — the TPU equivalent of gsplat's
`rasterize_to_pixels` CUDA kernels. Design notes (TPU-first, not a CUDA
translation):

  * Per-pair Gaussian data is gathered ONCE in XLA into a transposed
    (16, C) payload laid out field-major: each K-pair chunk is then a
    contiguous lane-slice DMA (HBM->VMEM, double buffered), not a row
    gather. Fields: [mx, my, conic_a, b, c, opacity, feat0..feat7, pad2].
  * No cumulative primitives in-kernel: the exclusive transmittance scan
    along the chunk axis becomes exp(log1p(-alpha) @ STRICT_UPPER_TRI) —
    a (P, K) @ (K, K) matmul on the MXU. Suffix sums in the backward use
    the strict-lower triangle the same way.
  * The grid is (num_tiles,); programs run sequentially on the core with
    pipelined output writes; tile pair-ranges come from a scalar-prefetch
    offsets array (DENSE CSR from the binning sort). Mosaic needs
    128-lane-aligned dynamic slices, so each tile's DMA window starts at
    the preceding chunk boundary and the head lanes (previous tile's
    pairs) are masked via jj < 0; the backward stages each tile's head
    chunk to a per-tile output and the caller scatter-adds it into the
    slab (lanewise-disjoint nonzero contributors).
  * Early termination: the forward sweep is a while_loop that stops once
    every pixel of the tile saturates (T <= 1e-4) — the CUDA
    rasterizer's per-pixel `break` at tile granularity — draining the
    in-flight prefetch so scratch semaphores stay balanced; the backward
    replays only up to the deepest contributor recorded by the forward
    (`last`), zero-filling the skipped gradient slabs.
  * Backward writes per-PAIR gradients to an exclusive (16, C) slab (no
    atomics; every pair owns a column). `reduce_segments` then sums them
    per Gaussian: gradients are re-ordered into pre-sort order (where
    each Gaussian's pairs are contiguous) and each program contracts
    512-lane chunks against a range-membership onehot on the MXU —
    exact summation, no 2M-row scatter-add.

Accumulators and tiles are (F|1, P=tile_size^2) so the lane dimension is
256 — native f32 tiling. All math is f32; semantics identical to the
oracle (alpha clamp 0.999, skip < 1/255, terminate at T <= 1e-4 with the
tripping Gaussian excluded).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.999
TRANSMITTANCE_EPS = 1e-4

PW = 16  # payload fields
GW = 16  # gradient fields: [dmx,dmy,da,db,dc,dop,df0..df7,absx,absy]
MAX_FEATS = 8


def _interpret() -> bool:
    """Run the kernels through the Pallas interpreter off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def pack_payload(means2d, conics, opacities, features, chunk: int):
    """(16, C + K) field-major payload with a zero K-column tail so chunk
    DMAs never run off the end (zero opacity => dead pairs)."""
    c = means2d.shape[0]
    f = features.shape[-1]
    assert f <= MAX_FEATS, f"pallas path supports <= {MAX_FEATS} features"
    cols = [means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1],
            conics[:, 2], opacities]
    cols += [features[:, i] for i in range(f)]
    while len(cols) < PW:
        cols.append(jnp.zeros((c,), jnp.float32))
    pay = jnp.stack(cols, axis=0)  # (16, C)
    return jnp.pad(pay, ((0, 0), (0, chunk)))


def _tri(k: int, kind: str) -> jax.Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    if kind == "strict_upper":  # M[j,k]=1 iff j<k  (exclusive prefix)
        return (row < col).astype(jnp.float32)
    if kind == "upper_incl":  # M[j,k]=1 iff j<=k (inclusive prefix)
        return (row <= col).astype(jnp.float32)
    if kind == "lower_incl":  # M[j,k]=1 iff j>=k (inclusive suffix)
        return (row >= col).astype(jnp.float32)
    if kind == "strict_lower":  # M[j,k]=1 iff j>k  (exclusive suffix)
        return (row > col).astype(jnp.float32)
    raise ValueError(kind)


def _make_cumsum_kernel(r: int, ch: int):
    def kernel(x_ref, out_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        blk = x_ref[...].astype(jnp.float32)  # (R, CH)
        tri = _tri(ch, "upper_incl")
        pref = jnp.dot(blk, tri, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out_ref[...] = (pref + carry_ref[:, 0:1]).astype(jnp.int32)
        carry_ref[...] = carry_ref[...] + jnp.broadcast_to(
            jnp.sum(blk, axis=1, keepdims=True), carry_ref.shape
        )

    return kernel


def cumsum_lanes_i32(x: jax.Array, chunk: int = 512) -> jax.Array:
    """Inclusive int32 cumulative sum along the lane (last) axis of a
    (R, C) array — EXACT while every running sum stays within |v| < 2^24.

    XLA's multi-pass scan over a 25 MB int32 table costs ~4 ms/frame in
    binning (perf/tpu_micro5.py); this single sequential sweep is
    bandwidth-bound: per 512-lane block, an (R, 512) @ (512, 512)
    inclusive-prefix triangular matmul on the MXU (f32 holds integers
    exactly below 2^24) plus a running per-row carry.
    """
    r, c = x.shape
    cp = -(-c // chunk) * chunk
    xp = jnp.pad(x, ((0, 0), (0, cp - c)))
    out = pl.pallas_call(
        _make_cumsum_kernel(r, chunk),
        grid=(cp // chunk,),
        in_specs=[pl.BlockSpec((r, chunk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, cp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
        interpret=_interpret(),
    )(xp)
    return out[:, :c]


def _make_expand_kernel(r: int, ch: int, n_pad: int, win: int,
                        out_dtype=jnp.int32):
    def kernel(base_sref, nwin_sref, vals_hbm, s_hbm, e_hbm, out_ref,
               vals_vmem, s_vmem, e_vmem, sems):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for src, dst, k in ((vals_hbm, vals_vmem, 0), (s_hbm, s_vmem, 1),
                                (e_hbm, e_vmem, 2)):
                cp = pltpu.make_async_copy(src, dst, sems.at[k])
                cp.start()
                cp.wait()

        p0 = j * ch
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1) + p0
        base = base_sref[j]
        nw = nwin_sref[j]

        def body(wi, acc):
            b = pl.multiple_of(base + wi * win, win)
            s_row = s_vmem[0:1, pl.ds(b, win)]  # (1, WIN)
            e_row = e_vmem[0:1, pl.ds(b, win)]
            s_col = s_row.reshape(win, 1)
            e_col = e_row.reshape(win, 1)
            onehot = ((s_col <= lane) & (lane < e_col)).astype(jnp.float32)
            vw = vals_vmem[:, pl.ds(b, win)]  # (R, WIN)
            return acc + jax.lax.dot_general(
                vw, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        acc = jax.lax.fori_loop(
            0, nw, body, jnp.zeros((r, ch), jnp.float32)
        )
        out_ref[...] = acc.astype(out_dtype)

    return kernel


def _make_expand_stream_kernel(r: int, ch: int, wb: int, win: int,
                               out_dtype=jnp.int32):
    """Large-N expand: the boundary tables stay VMEM-resident, but the
    value table is streamed from HBM in `wb`-Gaussian blocks as each
    output chunk's window sweep needs them (monotone access). The block
    DMAs are double-buffered: the serial start()/wait() formulation
    stalled every block on HBM latency and cost ~14 ms/frame at N=1M
    (perf/tpu_r4_probe2.py); prefetching block si+1 behind block si's
    window matmuls hides it."""
    wpb = wb // win

    def kernel(base_sref, nwin_sref, vals_hbm, s_ref, e_ref, out_ref,
               vals_vmem, sems):
        j = pl.program_id(0)
        p0 = j * ch
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1) + p0
        base = base_sref[j]
        nw = nwin_sref[j]
        nblk = pl.cdiv(nw, wpb)

        def dma(slot, si):
            b0 = pl.multiple_of(base + si * wb, win)
            return pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(b0, wb)], vals_vmem.at[slot],
                sems.at[slot],
            )

        @pl.when(nblk > 0)
        def _():
            dma(0, 0).start()

        def blk(si, acc):
            slot = si % 2

            @pl.when(si + 1 < nblk)
            def _():
                dma((si + 1) % 2, si + 1).start()

            dma(slot, si).wait()
            b0 = pl.multiple_of(base + si * wb, win)
            nw_here = jnp.minimum(nw - si * wpb, wpb)

            def wbody(wi, acc2):
                bl = pl.multiple_of(wi * win, win)  # block-local lanes
                bg = pl.multiple_of(b0 + wi * win, win)  # global (s/e)
                s_col = s_ref[0:1, pl.ds(bg, win)].reshape(win, 1)
                e_col = e_ref[0:1, pl.ds(bg, win)].reshape(win, 1)
                onehot = ((s_col <= lane) & (lane < e_col)).astype(
                    jnp.float32
                )
                vw = vals_vmem[slot, :, pl.ds(bl, win)]
                return acc2 + jax.lax.dot_general(
                    vw, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            return jax.lax.fori_loop(0, nw_here, wbody, acc)

        acc = jax.lax.fori_loop(0, nblk, blk, jnp.zeros((r, ch), jnp.float32))
        out_ref[...] = acc.astype(out_dtype)

    return kernel


def expand_segments(
    vals: jax.Array,  # (R, N) int32 |v| < 2^24, or f32 (any value)
    starts: jax.Array,  # (N + 1,) int32 ascending segment boundaries
    out_len: int,
    chunk: int = 2048,
    win: int = 128,
    out_dtype=jnp.int32,
    resident_max: int = 1 << 18,
) -> jax.Array:
    """Piecewise-constant expansion: out[:, p] = vals[:, g] for
    starts[g] <= p < starts[g+1] — the transpose of reduce_segments.

    Replaces the XLA delta-scatter + prefix-sum construction of per-pair
    fields (~2.6 ms at 1.6M pairs / 100k Gaussians): the whole value and
    boundary tables stay VMEM-resident (one DMA each), and every output
    chunk contracts 128-Gaussian membership windows on the MXU. The
    per-chunk window list comes from a host-free XLA searchsorted.
    Positions >= starts[-1] produce zeros. Exact for int32 |vals| < 2^24,
    and exact for ARBITRARY f32 vals (out_dtype=float32): segments are
    disjoint, so every output lane contracts exactly one val * 1.0 term.

    Above `resident_max` segments the value table no longer fits VMEM:
    the streaming variant keeps only the boundary rows resident (8 MB at
    N=1M) and DMAs value blocks on demand — layout/output identical
    (tests/test_binning.py asserts bit-equality).
    """
    r, n = vals.shape
    if n + 1 > resident_max:
        return _expand_segments_stream(vals, starts, out_len, win, out_dtype)
    n_pad = -(-(n + 1) // win) * win + win
    cp = -(-out_len // chunk) * chunk
    nchunks = cp // chunk
    vals_p = jnp.pad(vals, ((0, 0), (0, n_pad - n))).astype(jnp.float32)
    big = jnp.int32(2147483647)
    s_p = jnp.concatenate([starts[:-1], jnp.full((n_pad - n,), big)])
    e_p = jnp.concatenate([starts[1:], jnp.full((n_pad - n,), big)])
    bounds = jnp.arange(nchunks + 1, dtype=jnp.int32) * chunk
    # first segment whose END is past the chunk start (may cover it):
    glo = jnp.searchsorted(e_p[:n], bounds[:-1], side="right").astype(jnp.int32)
    # first segment whose START is at/after the chunk end:
    ghi = jnp.searchsorted(s_p[:n], bounds[1:], side="left").astype(jnp.int32)
    base = (glo // win) * win
    nwin = jnp.maximum(-(-(jnp.maximum(ghi - base, 0)) // win), 0)
    out = pl.pallas_call(
        _make_expand_kernel(r, chunk, n_pad, win, out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((r, chunk), lambda j, s1, s2: (0, j))],
            scratch_shapes=[
                pltpu.VMEM((r, n_pad), jnp.float32),
                pltpu.VMEM((1, n_pad), jnp.int32),
                pltpu.VMEM((1, n_pad), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((r, cp), out_dtype)],
        interpret=_interpret(),
    )(base, nwin, vals_p, s_p[None, :], e_p[None, :])[0]
    return out[:, :out_len]


def _expand_segments_stream(
    vals: jax.Array,
    starts: jax.Array,
    out_len: int,
    win: int = 128,
    out_dtype=jnp.int32,
    chunk: int = 2048,
    wb: int = 2048,
) -> jax.Array:
    # chunk=2048 measured best at C=5.24M / 5 int rows: 13.3 ms vs 13.7
    # (1024) / 16.3 (512) / 17.5 (4096) — perf/tpu_r4_probe4.py.
    """expand_segments for N past VMEM residency (see docstring there)."""
    r, n = vals.shape
    # The value-block DMA slices the (R, n_pad) table along the SUBLANE
    # axis: Mosaic only allows sublane slice sizes of 1/2/4 or multiples
    # of the (8, 128) tiling, so pad the row count up to the next legal
    # size (zero rows stream along and are dropped at the end).
    rp = r if r in (1, 2, 4) else -(-r // 8) * 8
    n_pad = -(-(n + 1) // win) * win + wb  # block DMAs may overrun by < wb
    cp = -(-out_len // chunk) * chunk
    nchunks = cp // chunk
    vals_p = jnp.pad(vals, ((0, rp - r), (0, n_pad - n))).astype(jnp.float32)
    big = jnp.int32(2147483647)
    s_p = jnp.concatenate([starts[:-1], jnp.full((n_pad - n,), big)])
    e_p = jnp.concatenate([starts[1:], jnp.full((n_pad - n,), big)])
    bounds = jnp.arange(nchunks + 1, dtype=jnp.int32) * chunk
    glo = jnp.searchsorted(e_p[:n], bounds[:-1], side="right").astype(jnp.int32)
    ghi = jnp.searchsorted(s_p[:n], bounds[1:], side="left").astype(jnp.int32)
    base = (glo // win) * win
    nwin = jnp.maximum(-(-(jnp.maximum(ghi - base, 0)) // win), 0)
    out = pl.pallas_call(
        _make_expand_stream_kernel(rp, chunk, wb, win, out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # vals (streamed)
                pl.BlockSpec((1, n_pad), lambda j, s1, s2: (0, 0),
                             memory_space=pltpu.VMEM),  # starts (resident)
                pl.BlockSpec((1, n_pad), lambda j, s1, s2: (0, 0),
                             memory_space=pltpu.VMEM),  # ends (resident)
            ],
            out_specs=[pl.BlockSpec((rp, chunk), lambda j, s1, s2: (0, j))],
            scratch_shapes=[
                pltpu.VMEM((2, rp, wb), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((rp, cp), out_dtype)],
        interpret=_interpret(),
    )(base, nwin, vals_p, s_p[None, :], e_p[None, :])[0]
    return out[:r, :out_len]


def _chunk_geometry(pay, px, py, jj, cnt):
    """Shared alpha computation: returns (alpha, hit, dx, dy, sigma, consts)."""
    mx = pay[0:1, :]
    my = pay[1:2, :]
    ca = pay[2:3, :]
    cb = pay[3:4, :]
    cc = pay[4:5, :]
    op = pay[5:6, :]
    dx = px - mx  # (P, K)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    ealpha = jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, op * ealpha)
    # jj < 0 masks the head lanes of the tile's first (alignment-rounded)
    # DMA window, which belong to the previous tile.
    hit = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (jj >= 0) & (jj < cnt)
    return alpha, hit, dx, dy, sigma, ealpha, (ca, cb, cc, op)


FWD_DMA_DEPTH = 4  # outstanding chunk DMAs; the serial wait chain at
# depth 2 stalls ~0.1 us/visit on HBM latency (perf/tpu_r5_probe6.py:
# null-skeleton full sweep 12.4 -> 9.0 -> 8.4 ms at depth 2/4/8)


def _make_fwd_kernel(n_feats: int, k: int, tile: int, tiles_x: int):
    p = tile * tile
    depth = FWD_DMA_DEPTH

    def kernel(starts_ref, counts_ref, payload_hbm, out_ref, tfin_ref,
               last_ref, pay_vmem, sems):
        t = pl.program_id(0)
        start = starts_ref[t]
        cnt = counts_ref[t]
        # Dense CSR: starts are not chunk-aligned. DMA windows begin at
        # the preceding chunk boundary; hoff head lanes (previous tile's
        # pairs) are masked out via jj < 0.
        a0 = pl.multiple_of((start // k) * k, k)
        hoff = start - a0
        nchunks = jnp.where(cnt > 0, pl.cdiv(hoff + cnt, k), 0)

        ty = t // tiles_x
        tx = t % tiles_x
        lid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (tx * tile + lid % tile).astype(jnp.float32) + 0.5
        py = (ty * tile + lid // tile).astype(jnp.float32) + 0.5

        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        tri_upper = _tri(k, "strict_upper")

        def dma(slot, ci):
            return pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(a0 + ci * k, k)],
                pay_vmem.at[slot],
                sems.at[slot],
            )

        # Fill the pipeline: chunks [0, min(depth-1, nchunks)) in
        # flight (depth-1 outstanding on depth slots). Invariant before
        # body(ci): chunks [ci, min(ci + depth - 1, nchunks)) are in
        # flight; body starts ci + depth - 1 — whose slot is the one
        # consumed at iteration ci - 1, so the start never races the
        # current chunk's reads — then waits ci.
        for i in range(depth - 1):
            @pl.when(i < nchunks)
            def _(i=i):
                dma(i % depth, i).start()

        def body(ci, carry):
            t_run, out, done, last = carry
            slot = ci % depth

            @pl.when(ci + depth - 1 < nchunks)
            def _():
                dma((ci + depth - 1) % depth, ci + depth - 1).start()

            dma(slot, ci).wait()
            pay = pay_vmem[slot]  # (PW, K)
            jj = ci * k + jrow - hoff  # in-tile pair index (< 0: head mask)
            alpha, hit, _, _, _, _, _ = _chunk_geometry(pay, px, py, jj, cnt)
            alpha_eff = jnp.where(hit, alpha, 0.0)

            lg = jnp.log1p(-alpha_eff)  # (P, K)
            excl = jnp.dot(lg, tri_upper, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            t_prev = t_run * jnp.exp(excl)
            next_t = t_prev * (1.0 - alpha_eff)
            would_term = hit & (next_t <= TRANSMITTANCE_EPS)
            # accept iff no terminator at or before this lane: lane index
            # strictly below the FIRST would_term lane (k if none). A
            # per-pixel min-reduce on the VPU instead of a second
            # (P, K) @ (K, K) triangular terminator-count matmul
            # (measured ~0.15 ms/frame faster at the bench config).
            first_term = jnp.min(
                jnp.where(would_term, jrow, k), axis=1, keepdims=True
            )  # (P, 1)
            accept = hit & (done <= 0.0) & (jrow < first_term)
            w = jnp.where(accept, alpha * t_prev, 0.0)  # (P, K)

            feats = pay[6:6 + n_feats, :]  # (F, K)
            out = out + jax.lax.dot_general(
                feats, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (F, P)

            # accept subset of hit => log1p(-alpha) == lg there: reuse it
            # instead of a second (P, K) log1p materialization.
            t_run = t_run * jnp.exp(
                jnp.sum(jnp.where(accept, lg, 0.0), axis=1, keepdims=True)
            )
            done = jnp.maximum(
                done,
                jnp.max(would_term.astype(jnp.float32), axis=1, keepdims=True),
            )
            last = jnp.maximum(
                last, jnp.max(jnp.where(accept, jj, -1), axis=1, keepdims=True)
            )
            return t_run, out, done, last

        init = (
            jnp.ones((p, 1), jnp.float32),
            jnp.zeros((n_feats, p), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.full((p, 1), -1, jnp.int32),
        )

        # Early termination: once every pixel of the tile has saturated
        # (T <= 1e-4), the remaining chunks contribute nothing — skip
        # them. High-opacity scenes saturate after a handful of splats,
        # so this cuts most of the chunk sweep (the CUDA rasterizer's
        # per-pixel `break`, reconstructed at tile granularity).
        def cond(state):
            ci, (t_run, out, done, last) = state
            return (ci < nchunks) & (jnp.min(done) <= 0.0)

        def wbody(state):
            ci, carry = state
            return ci + 1, body(ci, carry)

        ci_final, (t_run, out, done, last) = jax.lax.while_loop(
            cond, wbody, (jnp.zeros((), jnp.int32), init)
        )

        # Early exit leaves up to depth-1 prefetches (chunks [ci_final,
        # min(ci_final + depth - 1, nchunks))) in flight; drain their
        # semaphores or the next program's waits fire early.
        for j in range(depth - 1):
            @pl.when(ci_final + j < jnp.minimum(nchunks,
                                                ci_final + depth - 1))
            def _(j=j):
                dma((ci_final + j) % depth, ci_final + j).wait()

        out_ref[0] = out
        tfin_ref[0] = t_run.reshape(1, p)
        last_ref[0] = last.reshape(1, p)

    return kernel


def forward_tiles(
    payload: jax.Array,  # (6+F, C + K) — chunk tail pad for window overrun
    tile_starts: jax.Array,  # (T_padded + 1,) dense CSR offsets
    tile_counts: jax.Array,  # (T_padded,) per-tile pair counts
    n_tiles: int,
    n_feats: int,
    tile: int,
    tiles_x: int,
    chunk: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (out (T, F, P), t_final (T, 1, P), last (T, 1, P) int32)."""
    p = tile * tile
    kernel = _make_fwd_kernel(n_feats, chunk, tile, tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, n_feats, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((FWD_DMA_DEPTH, payload.shape[0], chunk),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((FWD_DMA_DEPTH,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, n_feats, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
        ],
        interpret=_interpret(),
    )(tile_starts, tile_counts, payload)


def _make_reduce_kernel(gw: int, chunk: int, blk: int):
    # starts_sref is the blk-strided subsample starts[::blk] — the kernel
    # only needs block bounds, and the full (N+1,) array would strain
    # scalar-prefetch memory at N ~ 1M.
    def kernel(starts_sref, grads_hbm, s_ref, e_ref, out_ref, g_vmem, sems):
        b = pl.program_id(0)
        l0 = pl.multiple_of((starts_sref[b] // chunk) * chunk, chunk)
        l1 = starts_sref[b + 1]  # end of the block's last segment
        nch = pl.cdiv(jnp.maximum(l1 - l0, 0), chunk)

        s_row = s_ref[0]  # (1, BLK) segment starts
        e_row = e_ref[0]  # (1, BLK) segment ends
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

        def dma(slot, j):
            return pltpu.make_async_copy(
                grads_hbm.at[:, pl.ds(l0 + j * chunk, chunk)],
                g_vmem.at[slot],
                sems.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            dma(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < nch)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            g = g_vmem[slot]  # (GW, CH)
            p = l0 + j * chunk + lane  # (CH, 1)
            onehot = ((p >= s_row) & (p < e_row)).astype(jnp.float32)
            return acc + jnp.dot(
                g, onehot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        acc = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((gw, blk), jnp.float32)
        )
        out_ref[0] = acc

    return kernel


def reduce_segments(
    grads: jax.Array,  # (GW, C) field-major, PRE-SORT pair order
    gauss_starts: jax.Array,  # (N + 1,) contiguous per-Gaussian ranges
    n: int,
    chunk: int = 512,
    blk: int = 128,
) -> jax.Array:
    """Per-Gaussian sums over contiguous pair ranges: out[:, g] =
    sum(grads[:, starts[g]:starts[g+1]]).

    The replacement for the 2M-row XLA segment-sum (~40 ms/frame at 2M
    pairs): each program owns 128 Gaussians, streams their combined lane
    range in 512-wide chunks, and contracts against an on-the-fly
    range-membership onehot on the MXU — exact per-segment summation
    (no prefix-sum cancellation). Returns (GW, N_pad); slice [:, :n].

    Requires grads to extend >= `chunk` lanes past starts[-1] (the
    caller pads the slab accordingly).
    """
    gw = grads.shape[0]
    # Mosaic memref slices need the sublane (row) dim 8-aligned.
    gw_pad = -(-gw // 8) * 8
    if gw_pad != gw:
        grads = jnp.pad(grads, ((0, gw_pad - gw), (0, 0)))
    n_pad = -(-n // blk) * blk
    starts_p = jnp.concatenate([
        gauss_starts,
        jnp.full((n_pad + 1 - gauss_starts.shape[0],), gauss_starts[-1],
                 jnp.int32),
    ])
    s_blocks = starts_p[:n_pad].reshape(-1, 1, blk)
    e_blocks = starts_p[1:n_pad + 1].reshape(-1, 1, blk)
    starts_coarse = starts_p[::blk]  # (n_pad//blk + 1,) block bounds
    kernel = _make_reduce_kernel(gw_pad, chunk, blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # grads
            pl.BlockSpec((1, 1, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gw_pad, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, gw_pad, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad // blk, gw_pad, blk),
                                        jnp.float32)],
        interpret=_interpret(),
    )(starts_coarse, grads, s_blocks, e_blocks)
    return jnp.moveaxis(out, 1, 0).reshape(gw_pad, n_pad)[:gw]


def _make_reduce_packed_kernel(pr: int, chunk: int, blk: int):
    """reduce_segments over bf16-PACKED rows: each int32 lane holds two
    bf16 fields (hi<<16 | lo); decode in-kernel via the exact bf16->f32
    promotion `f32 = bitcast(bits << 16)`, append |row0|,|row1| (absgrad)
    and contract against the range-membership onehot on the MXU."""
    gw = -(-(2 * pr + 2) // 8) * 8  # Mosaic: 8-aligned sublane counts

    def kernel(starts_sref, grads_hbm, s_ref, e_ref, out_ref, g_vmem, sems):
        b = pl.program_id(0)
        l0 = pl.multiple_of((starts_sref[b] // chunk) * chunk, chunk)
        l1 = starts_sref[b + 1]
        nch = pl.cdiv(jnp.maximum(l1 - l0, 0), chunk)

        s_row = s_ref[0]
        e_row = e_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

        def dma(slot, j):
            return pltpu.make_async_copy(
                grads_hbm.at[:, pl.ds(l0 + j * chunk, chunk)],
                g_vmem.at[slot],
                sems.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            dma(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < nch)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            g = g_vmem[slot]  # (PR, CH) int32
            hi = jax.lax.bitcast_convert_type(
                g & jnp.int32(-65536), jnp.float32
            )
            lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
            rows = []
            for i in range(pr):
                rows += [hi[i:i + 1], lo[i:i + 1]]
            rows += [jnp.abs(rows[0]), jnp.abs(rows[1])]
            while len(rows) < gw:
                rows.append(jnp.zeros_like(rows[0]))
            vals = jnp.concatenate(rows, axis=0)  # (GW, CH)
            p = l0 + j * chunk + lane
            onehot = ((p >= s_row) & (p < e_row)).astype(jnp.float32)
            return acc + jnp.dot(
                vals, onehot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        acc = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((gw, blk), jnp.float32)
        )
        out_ref[0] = acc

    return kernel


def reduce_segments_packed(
    packed: jax.Array,  # (PR, C) int32, PRE-SORT pair order, 2 bf16/lane
    gauss_starts: jax.Array,  # (N + 1,) contiguous per-Gaussian ranges
    n: int,
    chunk: int = 512,
    blk: int = 256,  # 13.1 ms vs 14.0 at blk=128 (C=5.24M, probe7)
) -> jax.Array:
    """Per-Gaussian sums over contiguous ranges of the PACKED slab,
    decoding in-kernel (no XLA unpack/stack pass, half the DMA bytes of
    the f32 variant). Returns (2*PR + 2, N_pad): the 2*PR decoded field
    rows followed by |field0|, |field1| (absgrad). Requires `packed` to
    extend >= chunk lanes past starts[-1]."""
    pr = packed.shape[0]
    pr_pad = -(-pr // 8) * 8
    if pr_pad != pr:
        packed = jnp.pad(packed, ((0, pr_pad - pr), (0, 0)))
    gw = -(-(2 * pr_pad + 2) // 8) * 8
    n_pad = -(-n // blk) * blk
    starts_p = jnp.concatenate([
        gauss_starts,
        jnp.full((n_pad + 1 - gauss_starts.shape[0],), gauss_starts[-1],
                 jnp.int32),
    ])
    s_blocks = starts_p[:n_pad].reshape(-1, 1, blk)
    e_blocks = starts_p[1:n_pad + 1].reshape(-1, 1, blk)
    starts_coarse = starts_p[::blk]  # (n_pad//blk + 1,) block bounds
    kernel = _make_reduce_packed_kernel(pr_pad, chunk, blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gw, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pr_pad, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad // blk, gw, blk),
                                        jnp.float32)],
        interpret=_interpret(),
    )(starts_coarse, packed, s_blocks, e_blocks)
    res = jnp.moveaxis(out, 1, 0).reshape(gw, n_pad)
    # decoded fields live in rows [0, 2*pr); abs rows at [2*pr_pad, +2)
    return jnp.concatenate(
        [res[:2 * pr], res[2 * pr_pad:2 * pr_pad + 2]], axis=0
    )


def _make_reduce_bykey_kernel(ru: int, chunk: int, blk: int):
    """Segment reduction KEYED BY VALUE instead of by position: the slab
    arrives sorted by each pair's ORIGINAL gaussian id, with the id
    riding as int32 row `ru` of the slab itself (rows 0..ru-1 are the
    bf16-packed gradient pairs). The per-block onehot is built by
    EQUALITY against the block's gaussian ids — `(1, CH) keys ==
    (BLK, 1) ids` broadcasts natively on the VPU (no lane->sublane
    transpose), and the contraction runs with BOTH operands lane-major
    (dot_general contracting dims (1, 1), the same MXU form the forward
    kernel's feature matmul uses). This removes the need for exact
    per-gaussian segment boundaries entirely: after live-window
    compaction drops a data-dependent subset of pairs, closed-form
    `orig_starts` no longer exist, and recovering them would cost an
    N-scale searchsorted/scatter (measured 20+ ms at N=1M) — the only
    boundary information this kernel needs is ~N/blk coarse block
    bounds. Lanes whose key falls outside the block's [g0, g0+blk)
    range (dead pairs keyed by a neighbour, zero-value padding keyed 0,
    sentinel-N tails) match nothing or add exact zeros."""
    gw = -(-(2 * ru + 2) // 8) * 8

    def kernel(coarse_sref, slab_hbm, out_ref, g_vmem, sems):
        b = pl.program_id(0)
        l0 = pl.multiple_of((coarse_sref[b] // chunk) * chunk, chunk)
        l1 = coarse_sref[b + 1]
        nch = pl.cdiv(jnp.maximum(l1 - l0, 0), chunk)
        gids = b * blk + jax.lax.broadcasted_iota(
            jnp.int32, (blk, 1), 0
        )  # (BLK, 1) this block's gaussian ids

        def dma(slot, j):
            return pltpu.make_async_copy(
                slab_hbm.at[:, pl.ds(l0 + j * chunk, chunk)],
                g_vmem.at[slot],
                sems.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            dma(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < nch)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            g = g_vmem[slot]  # (8, CH) int32: bf16 pairs + key row
            hi = jax.lax.bitcast_convert_type(
                g & jnp.int32(-65536), jnp.float32
            )
            lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
            rows = []
            for i in range(ru):
                rows += [hi[i:i + 1], lo[i:i + 1]]
            rows += [jnp.abs(rows[0]), jnp.abs(rows[1])]
            while len(rows) < gw:
                rows.append(jnp.zeros_like(rows[0]))
            vals = jnp.concatenate(rows, axis=0)  # (GW, CH)
            keys = g[ru:ru + 1]  # (1, CH)
            onehot_t = (keys == gids).astype(jnp.float32)  # (BLK, CH)
            return acc + jax.lax.dot_general(
                vals, onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        acc = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((gw, blk), jnp.float32)
        )
        out_ref[0] = acc

    return kernel


def reduce_segments_bykey(
    slab: jax.Array,  # (8, L) int32: rows 0..ru-1 bf16 pairs, row ru keys
    coarse: jax.Array,  # (n_pad//blk + 1,) int32 block lane bounds
    ru: int,  # number of packed value rows (key row index)
    n: int,
    chunk: int = 512,
    blk: int = 256,
) -> jax.Array:
    """Per-Gaussian sums over a KEY-SORTED packed slab (see the kernel
    docstring). `coarse[b]` is the first lane whose key is >= b * blk
    (from one ~N/blk-query searchsorted on the sorted key row) and the
    slab must extend >= `chunk` zero-value lanes past coarse[-1].
    Returns (2*ru + 2, n_pad): decoded field sums + |field0|, |field1|
    (absgrad), original parameter order."""
    assert slab.shape[0] == 8 and ru < 8
    gw = -(-(2 * ru + 2) // 8) * 8
    n_pad = -(-n // blk) * blk
    kernel = _make_reduce_bykey_kernel(ru, chunk, blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, gw, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad // blk, gw, blk),
                                        jnp.float32)],
        interpret=_interpret(),
    )(coarse, slab)
    res = jnp.moveaxis(out, 1, 0).reshape(gw, n_pad)
    return jnp.concatenate([res[:2 * ru], res[2 * ru:2 * ru + 2]], axis=0)


def _make_reduce_packed_multi_kernel(kp: int, pr: int, chunk: int,
                                     blk: int, nb1: int):
    """reduce_segments_packed over KP independently-sorted slab PIECES:
    each gaussian owns one contiguous segment per piece; the program
    accumulates all KP segments before writing its output block. This is
    what makes the piecewise reduction sort profitable: the XLA sort is
    superlinear in length (key+7: 9.5 ms at C/4 vs 43.8 ms at C=5.24M,
    perf/tpu_r4_probe3.py), and a single multi-range reduce pass keeps
    the reduce side at ~one program grid instead of KP full passes."""
    gw = -(-(2 * pr + 2) // 8) * 8

    def kernel(coarse_sref, grads_hbm, s_ref, e_ref, out_ref, g_vmem, sems):
        b = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        acc0 = jnp.zeros((gw, blk), jnp.float32)

        def piece(j, acc):
            l0 = pl.multiple_of(
                (coarse_sref[j * nb1 + b] // chunk) * chunk, chunk
            )
            l1 = coarse_sref[j * nb1 + b + 1]
            nch = pl.cdiv(jnp.maximum(l1 - l0, 0), chunk)
            # piece-local segment starts/ends for this gaussian block
            s_row = s_ref[0, 0, j].reshape(1, blk)
            e_row = e_ref[0, 0, j].reshape(1, blk)

            def dma(slot, i):
                return pltpu.make_async_copy(
                    grads_hbm.at[j, :, pl.ds(l0 + i * chunk, chunk)],
                    g_vmem.at[slot],
                    sems.at[slot],
                )

            @pl.when(nch > 0)
            def _():
                dma(0, 0).start()

            def body(i, a):
                slot = i % 2

                @pl.when(i + 1 < nch)
                def _():
                    dma((i + 1) % 2, i + 1).start()

                dma(slot, i).wait()
                g = g_vmem[slot]  # (PR, CH) int32 bf16 pairs
                hi = jax.lax.bitcast_convert_type(
                    g & jnp.int32(-65536), jnp.float32
                )
                lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
                rows = []
                for i_ in range(pr):
                    rows += [hi[i_:i_ + 1], lo[i_:i_ + 1]]
                rows += [jnp.abs(rows[0]), jnp.abs(rows[1])]
                while len(rows) < gw:
                    rows.append(jnp.zeros_like(rows[0]))
                vals = jnp.concatenate(rows, axis=0)
                pos = l0 + i * chunk + lane
                onehot = ((pos >= s_row) & (pos < e_row)).astype(jnp.float32)
                return a + jnp.dot(
                    vals, onehot, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            return jax.lax.fori_loop(0, nch, body, acc)

        acc = acc0
        for j in range(kp):  # static unroll: piece count is tiny
            acc = piece(j, acc)
        out_ref[0] = acc

    return kernel


def reduce_segments_packed_multi(
    packed: jax.Array,  # (KP, PR, CP) int32 — KP sorted pieces
    piece_starts: jax.Array,  # (KP, N + 1) piece-LOCAL segment starts
    n: int,
    chunk: int = 512,
    blk: int = 256,
) -> jax.Array:
    """Per-Gaussian sums over KP piece-sorted slabs (see the kernel
    docstring). Each piece must extend >= chunk lanes past its own
    piece_starts[j, -1]. Returns (2*PR + 2, N_pad) like
    reduce_segments_packed."""
    kp, pr, cp = packed.shape
    pr_pad = -(-pr // 8) * 8
    if pr_pad != pr:
        packed = jnp.pad(packed, ((0, 0), (0, pr_pad - pr), (0, 0)))
    gw = -(-(2 * pr_pad + 2) // 8) * 8
    n_pad = -(-n // blk) * blk
    starts_p = jnp.concatenate([
        piece_starts,
        jnp.broadcast_to(piece_starts[:, -1:],
                         (kp, n_pad + 1 - piece_starts.shape[1])),
    ], axis=1)  # (KP, n_pad + 1)
    s_blocks = jnp.moveaxis(
        starts_p[:, :n_pad].reshape(kp, -1, blk), 0, 1
    ).reshape(-1, 1, kp, blk)
    e_blocks = jnp.moveaxis(
        starts_p[:, 1:n_pad + 1].reshape(kp, -1, blk), 0, 1
    ).reshape(-1, 1, kp, blk)
    nb1 = n_pad // blk + 1
    starts_coarse = starts_p[:, ::blk].reshape(-1)  # (KP * nb1,)
    kernel = _make_reduce_packed_multi_kernel(kp, pr_pad, chunk, blk, nb1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, kp, blk), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp, blk), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gw, blk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pr_pad, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad // blk, gw, blk),
                                        jnp.float32)],
        interpret=_interpret(),
    )(starts_coarse, packed, s_blocks, e_blocks)
    res = jnp.moveaxis(out, 1, 0).reshape(gw, n_pad)
    return jnp.concatenate(
        [res[:2 * pr], res[2 * pr_pad:2 * pr_pad + 2]], axis=0
    )


def _rne_bf16_bits(x: jax.Array) -> jax.Array:
    """Round-to-nearest-even f32 -> bf16 bit pattern in the LOW 16 bits of
    an int32 (sign-extended garbage above — callers mask/shift). Pure
    32-bit integer arithmetic (Mosaic-safe, no 16-bit types); matches
    XLA's f32->bf16 convert for all finite inputs."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (b + 0x7FFF + ((b >> 16) & 1)) >> 16


def _make_bwd_kernel(n_feats: int, k: int, tile: int, tiles_x: int,
                     pack_grads: bool):
    p = tile * tile
    pr = (6 + n_feats + 1) // 2  # packed int32 rows

    def kernel(starts_ref, counts_ref, payload_hbm, g_out_ref, g_alpha_ref,
               tfin_ref, last_ref, zslab_hbm, grad_hbm, stage_ref, nch_ref,
               pay_vmem, grad_vmem, sems, gsem):
        del zslab_hbm  # aliased zero-filled buffer == grad_hbm
        t = pl.program_id(0)
        start = starts_ref[t]
        cnt = counts_ref[t]
        # Dense CSR windowing (see forward): the head chunk's window can
        # overlap the previous tile's tail lanes. Its gradient columns go
        # to the per-tile `stage` output instead of the slab (unowned
        # lanes are exact zeros — hit masks force g_alpha_k = 0 there);
        # XLA scatter-adds the staged windows into the slab afterward.
        a0 = pl.multiple_of((start // k) * k, k)
        hoff = start - a0

        ty = t // tiles_x
        tx = t % tiles_x
        lid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (tx * tile + lid % tile).astype(jnp.float32) + 0.5
        py = (ty * tile + lid // tile).astype(jnp.float32) + 0.5

        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        tri_low_incl = _tri(k, "lower_incl")

        g_out = g_out_ref[0]  # (F, P)
        g_alpha_pix = g_alpha_ref[0]  # (1, P)
        t_fin = tfin_ref[0]  # (1, P)
        last = last_ref[0]  # (1, P) int32
        # per-pixel column vectors
        g_alpha_c = g_alpha_pix.reshape(p, 1)
        t_fin_c = t_fin.reshape(p, 1)
        last_c = last.reshape(p, 1)

        def dma_in(slot, ci):
            return pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(a0 + ci * k, k)],
                pay_vmem.at[slot],
                sems.at[slot],
            )

        def dma_out(slot, ci):
            return pltpu.make_async_copy(
                grad_vmem.at[slot],
                grad_hbm.at[:, pl.ds(a0 + ci * k, k)],
                gsem.at[slot],
            )

        # The replay only needs chunks up to the deepest contributor
        # recorded by the forward pass: chunks past max(last) have
        # alpha_eff == 0 everywhere (they neither move t_back/sacc nor
        # produce gradients). Their slabs are left UNWRITTEN — the output
        # buffer is aliased to a zero-filled input (one 0.07 ms memset on
        # the XLA side), so skipped columns read back as exact zeros
        # (in-kernel serial zero-fill DMAs cost ~15 ms/frame; a separate
        # XLA write-limit mask pass cost ~0.5 ms).
        ml = jnp.max(last)  # deepest in-tile contributor (-1: none)
        nch_eff = jnp.where(ml < 0, 0, (hoff + ml + k) // k)
        nch_ref[0] = jnp.full((1, 128), nch_eff, jnp.int32)
        stage_ref[0] = jnp.zeros_like(stage_ref[0])  # no-contributor tiles

        # Input pipeline depth FWD_DMA_DEPTH (see _make_fwd_kernel): the
        # reverse replay fills chunks [nch_eff-1, nch_eff-depth+1] and
        # each iteration starts i + depth - 1 (its slot was consumed at
        # iteration i - 1) before waiting i. Outputs keep their own
        # 2-slot protocol (oslot).
        depth = FWD_DMA_DEPTH
        for j in range(depth - 1):
            @pl.when(j < nch_eff)
            def _(j=j):
                dma_in(j % depth, nch_eff - 1 - j).start()

        def body(i, carry):
            t_back, sacc = carry
            ci = nch_eff - 1 - i
            slot = i % depth
            oslot = i % 2

            @pl.when(i + depth - 1 < nch_eff)
            def _():
                dma_in((i + depth - 1) % depth,
                       nch_eff - 1 - (i + depth - 1)).start()

            # Slab writes are double-buffered: before reusing this slot's
            # grad_vmem, retire the write issued two iterations ago (for
            # chunk ci + 2). Keeps the output DMA in flight behind the
            # current chunk's compute instead of stalling every step.
            @pl.when(i >= 2)
            def _():
                dma_out(oslot, ci + 2).wait()

            dma_in(slot, ci).wait()
            pay = pay_vmem[slot]
            jj = ci * k + jrow - hoff  # in-tile index (< 0: head mask)
            alpha, hit, dx, dy, sigma, ealpha, (ca, cb, cc, op) = (
                _chunk_geometry(pay, px, py, jj, cnt)
            )
            accept = hit & (jj <= last_c)
            alpha_eff = jnp.where(accept, alpha, 0.0)
            one_m = 1.0 - alpha_eff
            lr = -jnp.log1p(-alpha_eff)  # log(1/(1-a)) >= 0
            suf = jnp.exp(
                jnp.dot(lr, tri_low_incl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            )
            t_entry = t_back * suf
            w = alpha_eff * t_entry  # (P, K)

            feats = pay[6:6 + n_feats, :]  # (F, K)
            # fg[p,k] = sum_c g_out[c,p] * feats[c,k]
            fg = jax.lax.dot_general(
                g_out, feats, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(p, k)
            wfg = w * fg
            # strict suffix = inclusive suffix - self: shares the SAME
            # triangular matrix as the `suf` scan (weights stay stationary
            # on the MXU across both matmuls).
            q = (
                jnp.dot(wfg, tri_low_incl,
                        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
                - wfg + sacc
            )
            # direct reciprocal (same formulation as the XLA backward)
            # instead of exp(lr): one less (P, K) transcendental.
            rcp = 1.0 / one_m
            g_alpha_k = jnp.where(
                accept,
                t_entry * fg - q * rcp + g_alpha_c * t_fin_c * rcp,
                0.0,
            )
            not_capped = (alpha < MAX_ALPHA).astype(jnp.float32)
            g_sigma = -alpha * g_alpha_k * not_capped  # accept via g_alpha_k

            # per-pair reductions over pixels (sublane axis)
            g_a = jnp.sum(g_sigma * 0.5 * dx * dx, axis=0, keepdims=True)
            g_b = jnp.sum(g_sigma * dx * dy, axis=0, keepdims=True)
            g_c = jnp.sum(g_sigma * 0.5 * dy * dy, axis=0, keepdims=True)
            g_mx_pk = -g_sigma * (ca * dx + cb * dy)
            g_my_pk = -g_sigma * (cc * dy + cb * dx)
            g_mx = jnp.sum(g_mx_pk, axis=0, keepdims=True)
            g_my = jnp.sum(g_my_pk, axis=0, keepdims=True)
            g_op = jnp.sum(
                g_alpha_k * ealpha * not_capped, axis=0, keepdims=True
            )
            # dL/dfeat[c,k] = sum_p g_out[c,p] w[p,k]
            g_feat = jnp.dot(g_out, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

            rows = [g_mx, g_my, g_a, g_b, g_c, g_op] + [
                g_feat[i:i + 1] for i in range(n_feats)
            ]
            # Unowned lanes (the head window's previous-tile columns and
            # the tail overrun) MUST be integer/FP zero bits: the staged
            # head-window merge is an ADD that assumes at most one
            # nonzero contributor per lane. The masked math yields
            # NEGATIVE zero for them on Mosaic (g_sigma = -alpha * 0.0),
            # which bf16-packs to 0x8000 — a NONZERO int32 that corrupts
            # the packed merge (integer add flips the partner's sign
            # bit). Mask structurally instead of relying on ±0.0.
            owned = (jj >= 0) & (jj < cnt)  # (1, K)
            if pack_grads:
                # Emit the slab already bf16-packed (2 fields / int32
                # lane) — the reduction sort carries these rows directly
                # and reduce_segments_packed decodes in-kernel; no XLA
                # pack pass, half the slab bytes. RNE here == the XLA
                # astype(bfloat16) the unpacked path uses.
                if len(rows) % 2:
                    rows.append(jnp.zeros((1, k), jnp.float32))
                for ri in range(len(rows) // 2):
                    hi = _rne_bf16_bits(rows[2 * ri])
                    lo = _rne_bf16_bits(rows[2 * ri + 1])
                    word = (hi << 16) | (lo & 0xFFFF)
                    grad_vmem[oslot, ri:ri + 1] = jnp.where(owned, word, 0)
                for z in range(len(rows) // 2, 8):
                    grad_vmem[oslot, z:z + 1] = jnp.zeros((1, k), jnp.int32)
            else:
                for ri, row in enumerate(rows):
                    grad_vmem[oslot, ri:ri + 1] = jnp.where(owned, row, 0.0)
                for z in range(6 + n_feats, GW - 2):
                    grad_vmem[oslot, z:z + 1] = jnp.zeros((1, k), jnp.float32)
                grad_vmem[oslot, GW - 2:GW - 1] = jnp.where(
                    owned, jnp.abs(g_mx), 0.0)
                grad_vmem[oslot, GW - 1:GW] = jnp.where(
                    owned, jnp.abs(g_my), 0.0)

            # Head chunk (ci == 0) is staged per-tile (its window may
            # overlap the previous tile's tail columns); deeper chunks
            # stream straight to the slab, double-buffered.
            @pl.when(ci > 0)
            def _():
                dma_out(oslot, ci).start()

            @pl.when(ci == 0)
            def _():
                stage_ref[0] = grad_vmem[oslot]

            t_back = t_back * jnp.exp(jnp.sum(lr, axis=1, keepdims=True))
            sacc = sacc + jnp.sum(wfg, axis=1, keepdims=True)
            return t_back, sacc

        init = (t_fin_c, jnp.zeros((p, 1), jnp.float32))
        jax.lax.fori_loop(0, nch_eff, body, init)

        # Retire the trailing slab write before the program ends: the DMA
        # semaphores are shared scratch across grid steps, so leaving a
        # copy in flight would corrupt the next tile's accounting. Writes
        # are issued for ci >= 1 only (ci == 0 is staged); the loop's own
        # slot-reuse waits retire everything except iteration
        # i = nch_eff - 2 (chunk ci = 1).
        @pl.when(nch_eff >= 2)
        def _():
            dma_out(nch_eff % 2, 1).wait()

    return kernel


def backward_tiles(
    payload: jax.Array,  # (6+F, C_pad + K)
    tile_starts: jax.Array,
    tile_counts: jax.Array,
    g_out_tiles: jax.Array,  # (T, F, P)
    g_alpha_tiles: jax.Array,  # (T, 1, P)
    tfin_tiles: jax.Array,  # (T, 1, P)
    last_tiles: jax.Array,  # (T, 1, P) int32
    n_tiles: int,
    n_feats: int,
    tile: int,
    tiles_x: int,
    chunk: int,
    pack_grads: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (per-pair gradient slab, staged head windows (T, R, chunk),
    per-tile replayed chunk counts (T,)).
    With pack_grads=False the slab rows are (GW=16, C) f32 with absgrad
    rows at the end; with pack_grads=True (8, C) int32 of bf16 pairs in
    field order [mx,my|a,b|c,op|f0,f1|...] (no abs rows — the packed
    reducer derives them). Dense CSR: each tile's HEAD chunk (whose
    alignment window may overlap the previous tile's tail columns) is
    emitted into `stage` instead of the slab; the caller scatter-adds
    stage[t] into slab window starts[t] // chunk (disjoint nonzero
    lanes, so addition is exact even on packed int32 rows). Columns past
    a tile's replayed depth are EXACT ZEROS: the slab output aliases a
    zero-initialized input buffer."""
    p = tile * tile
    kernel = _make_bwd_kernel(n_feats, chunk, tile, tiles_x, pack_grads)
    if pack_grads:
        zslab = jnp.zeros((8, payload.shape[1]), jnp.int32)
    else:
        zslab = jnp.zeros((GW, payload.shape[1]), jnp.float32)
    stage_rows, stage_dt = zslab.shape[0], zslab.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # payload
            pl.BlockSpec((1, n_feats, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zero slab (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, stage_rows, chunk), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda t, s1, s2: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((FWD_DMA_DEPTH, payload.shape[0], chunk),
                       jnp.float32),
            pltpu.VMEM((2, 8, chunk), jnp.int32) if pack_grads
            else pltpu.VMEM((2, GW, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((FWD_DMA_DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads, stage, nch = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(zslab.shape, zslab.dtype),
            jax.ShapeDtypeStruct((n_tiles, stage_rows, chunk), stage_dt),
            jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.int32),
        ],
        # input 7 (after the 2 scalar-prefetch args: starts, counts, then
        # payload, g_out, g_alpha, tfin, last, zslab) -> output 0.
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_starts, tile_counts, payload, g_out_tiles, g_alpha_tiles,
      tfin_tiles, last_tiles, zslab)
    return grads, stage, nch[:, 0, 0]
