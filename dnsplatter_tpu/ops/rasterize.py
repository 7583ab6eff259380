"""Production tiled rasterizer (TPU-first, pure JAX + custom VJP).

This is the framework's equivalent of gsplat's CUDA `isect_tiles` /
`isect_offset_encode` / `rasterize_to_pixels` fwd+bwd stack (consumed by the
reference at dn_splatter/dn_model.py:495-516, 564-575) — re-designed for the
TPU execution model instead of translated:

  * No per-pixel thread divergence / early `break`: pixels are processed in
    16x16 tiles as dense (K=chunk, P=tile^2) blocks. Transmittance is
    computed with triangular-matrix matmuls (MXU), and the feature
    accumulation is a (K, F)^T @ (K, P) matmul.
  * No dynamic shapes, and ONE sort builds the kernel-ready layout: the
    (tile, gaussian) intersection list is emitted as a DENSE CSR by a
    single key sort — no searchsorted, no gather of sorted values: the
    sort key packs `tile * (N+1) + gauss`, so the sorted keys THEMSELVES
    decode to the per-pair gaussian indices (within a tile, gaussian
    index order IS front-to-back depth order, because gaussians are
    globally depth-sorted before expansion). Tile ranges are NOT padded
    to the DMA chunk: the Pallas kernels window each tile's range down
    to the preceding 128-lane boundary and mask the head (Mosaic needs
    128-aligned dynamic lane slices), which keeps ~tiles*(chunk-1)/2
    alignment dummies out of every sort, gather, and slab.
  * The per-pair payload and per-pair gradients live in pair-major
    (C, 16) layouts: one row gather builds the payload (no transpose);
    the Pallas kernels compute in a (K, P) orientation so geometry fields
    broadcast from (K, 1) columns and feature accumulation contracts on
    the MXU without any in-kernel transpose.
  * The backward pass is a hand-derived back-to-front replay (same math as
    gsplat's CUDA backward); per-pair gradients are reduced per-Gaussian
    with one segment-sum keyed by the decoded pair indices (dummy pairs
    fall into an overflow bucket that is dropped).
  * `absgrad` (gsplat's absolute screen-space gradient used for
    densification, dn_model.py:506 `absgrad=True`) is exposed through a
    zero "sink" input whose VJP output is the absolute per-tile means2d
    gradient accumulation.

Semantics match `rasterize_pixels_ref` (the oracle) exactly:
  alpha = min(0.999, opacity * exp(-sigma)), skip if alpha < 1/255 or
  sigma < 0; a pixel terminates when the would-be next transmittance
  drops to <= 1e-4 (the tripping Gaussian is NOT composited).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.999
TRANSMITTANCE_EPS = 1e-4


class RasterizeConfig(NamedTuple):
    """Static rasterizer configuration (hashable -> usable as a nondiff arg).

    Attributes:
        width, height: image size in pixels.
        tile_size: square pixel tile edge (16 matches the reference's
            gsplat call, dn_model.py:470-471; P = tile_size**2).
        chunk: Gaussians composited per block step (K). Lane-friendly
            sizes (64/128) keep the (K, P) work dense on the VPU/MXU.
        tile_block: tiles processed together per scan step (XLA backend).
        pair_capacity: static capacity C of the (tile, gaussian)
            intersection list. On overflow whole Gaussians drop, in
            expansion order: deepest first under the depth-presorted
            schemes (graceful degradation), ORIGINAL ARRAY order under
            "depthq" (no pre-sort exists to rank by; auto-sized
            capacities make overflow rare — see bin_gaussians).
    """

    width: int
    height: int
    tile_size: int = 16
    chunk: int = 64
    tile_block: int = 32
    pair_capacity: int = 1 << 20
    backend: str = "xla"  # "xla" (portable) | "pallas" (TPU kernels)
    # Per-Gaussian gradient reduction strategy (pallas backend only):
    #   "segsum"   — exact f32 scatter-add (jax.ops.segment_sum); ~31 ms
    #                at 1.9M pairs on TPU (per-row serialized scatter).
    #   "sortpack" — round per-pair grads to bf16, pack 2 fields/int32,
    #                variadic-sort them into pre-sort pair order (where
    #                each Gaussian's pairs are contiguous) and reduce
    #                with the MXU reduce_segments kernel; ~13.5 ms at the
    #                same scale. Grad error from the bf16 rounding is
    #                ~2^-9 relative per pair (sums recover in f32).
    grad_reduce: str = "sortpack"
    # Exact ellipse-tile culling (pallas backend): drop (gaussian, tile)
    # pairs whose maximum alpha over the tile square is < 1/255 — they
    # can never pass the kernels' hit test, so removing them is
    # semantics-exact. The minimum of the (convex, PD) conic quadratic
    # over the tile rect is the center if inside, else the best of the
    # four clamped edge minimizers. Culled pairs keep their CSR slots
    # (sentinel key sorts them to the tile's tail) but per-tile counts
    # shrink, so both kernels skip whole trailing chunks. Default OFF:
    # at the bench scene the cull rate is only ~11% (the opacity-aware
    # tight AABBs already cut most corner waste) and the test's binning
    # cost (+6 expanded rows + a searchsorted) outweighs the kernel
    # savings — re-measured round 3 (perf/tpu_cull_ab.py): ON loses
    # 0.3 ms/frame at N=100k and 4.5 ms at N=1M (the streamed 11-row
    # expand pads to 16 rows). Enable only for heavy-overdraw /
    # strongly anisotropic scenes.
    exact_cull: bool = False
    # Binning sort scheme:
    #   "packed"  — ONE int32 key `tile * (N+1) + gauss`; the sorted keys
    #               decode to per-pair gaussian indices (1 key + 1
    #               payload row). Requires (T_pad+1)*(N+1) < 2^31.
    #   "packed32" — the same single-key sort in uint32: the extra bit
    #               doubles the ceiling to (T_pad+1)*(N+1) <= 2^32,
    #               which covers N <= 1.86M at the bench tiling.
    #   "tilekey" — STABLE sort on `tile*2 + cullbit` with the gaussian
    #               index riding as payload (1 key + 2 payload rows,
    #               ~1 extra sort row of cost). Within a tile the
    #               pre-sort pair order IS ascending-gaussian (= depth)
    #               order, so stability reproduces the packed layout
    #               exactly — no integer ceiling, any N.
    #   "auto"    — packed when it fits in int32, else packed32 when it
    #               fits in uint32, else tilekey.
    #   "depthq"  — NO global depth pre-sort: gaussians stay in original
    #               parameter order and the sort key packs
    #               `tile * 2^qb + quantize(depth, qb bits)` in uint32
    #               (qb = 32 - ceil(log2(T_pad + 1)); >= 20 bits at the
    #               bench tiling). Kills the N-scale depth argsort AND
    #               the (N, 16) depth-order table gather, and collapses
    #               the depth-index/original-id duality (pair_gauss ==
    #               pair_orig, gauss_starts == orig_starts). Within-tile
    #               order is quantized-depth order with platform-
    #               deterministic ties — renders differ from the exact
    #               schemes only by transcendental-level reorders of
    #               near-equal-depth (< depth-range / 2^qb) splats
    #               (gsplat's CUDA key packs the full f32 depth bits;
    #               this trades <= 2^-20-relative reorders for ~10
    #               ms/frame at N=1M). Both backends share the layout,
    #               so cross-backend parity is unaffected.
    sort_scheme: str = "auto"
    # Piecewise gradient-reduction sort (pallas sortpack only): split the
    # per-pair gradient slab at KP pair-balanced TILE boundaries, sort
    # each piece independently (one batched (KP, cp) lax.sort), and
    # reduce all pieces in one multi-range kernel pass. The XLA sort is
    # superlinear in length (key+7 rows: 9.5 ms at C/4 vs 43.8 ms at
    # C=5.24M, perf/tpu_r4_probe3.py) — but measured END-TO-END the
    # dynamic-slice/pad piece machinery eats the saving (full fwd+bwd at
    # N=1M: pieces4 148.0 vs mono 141.1 ms/frame, perf/tpu_r4_probe4.py),
    # so 0 = auto resolves to 1 (monolithic). The piecewise path stays
    # available for configs where static piece boundaries apply.
    reduce_pieces: int = 0
    # Live-window compaction of the backward gradient slab (pallas
    # sortpack, reduce_pieces == 1). The forward records each tile's
    # deepest contributor (`last`); every slab window (128-lane chunk
    # piece) holding only pairs past its tile's last contributor is
    # provably all-zero gradient, and ~40-60% of windows are dead at the
    # bench scenes (tile-level early termination) — yet the reduction
    # sort is priced by its STATIC lane count. This knob drops dead
    # windows before the sort:
    #   0.0     — legacy path: staged head-window scatter-merge +
    #             pair_orig-keyed monolithic sort + boundary
    #             reduce_segments_packed (orig_starts).
    #   (0, 1)  — keep at most ceil(frac * nwin) live windows
    #             (whole-window gathers are aligned (8, 128)-tile moves,
    #             no cross-lane rotate), APPEND the staged head windows
    #             to the sort input (keyed by the same pair_orig
    #             windows) instead of scatter-merging them, sort the
    #             shorter slab, and reduce with the key-equality kernel
    #             (reduce_segments_bykey — boundary-free, so the
    #             data-dependent drop needs no N-scale orig_starts
    #             recovery). Falls back at RUNTIME (lax.cond) to the
    #             uncompacted bykey path if a frame's live windows
    #             exceed the static budget.
    #   1.0     — bykey path without window dropping (stage append +
    #             merge elimination only).
    # Measured (perf/tpu_r5_probe{,3}.py, v5e): live fractions 0.328
    # (N=100k bench scene) / 0.112 (N=1M); full fwd+bwd -1.9 ms at
    # frac 0.37 @100k and -37.7 ms (132.3 -> 94.6, -28%) at frac 0.2
    # @1M; gradients bit-identical to the legacy path at every frac;
    # worst case (budget exceeded at runtime) is the uncompacted bykey
    # fallback at +3 ms vs legacy. Default 0.375 fits both measured
    # scenes; the bench pins the per-scale measured-best values.
    compact_frac: float = 0.375

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def n_blocks(self) -> int:
        return -(-self.n_tiles // self.tile_block)

    @property
    def n_tiles_padded(self) -> int:
        return self.n_blocks * self.tile_block

    @property
    def n_reduce_pieces(self) -> int:
        if self.reduce_pieces:
            return self.reduce_pieces
        return 1

    @property
    def piece_capacity(self) -> int:
        """Static per-piece slab capacity: balanced share + one-tile
        slack (boundaries are searchsorted to ~equal pair counts; the
        residual imbalance is at most a single tile's pair count —
        measured max 4,007 pairs/tile at the N=1M bench scene; the
        runtime piece_ok cond falls back to the monolithic sort if a
        scene ever exceeds the slack)."""
        kp = self.n_reduce_pieces
        cap = self.pair_capacity // kp + 16384
        return -(-cap // self.chunk) * self.chunk

    @property
    def pair_buffer(self) -> int:
        """Length of the emitted pair arrays: `pair_capacity` dense slots
        plus one chunk of sentinel tail so the kernels' head-aligned DMA
        windows (which can overrun a tile's end by < chunk) stay in
        bounds."""
        return self.pair_capacity + self.chunk


class _Binned(NamedTuple):
    """Depth-sorted Gaussians + dense CSR tile intersection structure.

    The pair list is the kernel-ready DENSE CSR layout: tile t's pairs
    occupy slots [starts[t], starts[t+1]) == [starts[t], starts[t] +
    counts[t]) in front-to-back depth order, gap-free (starts are NOT
    chunk-aligned — the Pallas kernels handle head alignment). Dead
    slots live past starts[-1]; one sentinel `chunk` tail keeps kernel
    DMA windows in bounds.
    """

    order: jax.Array  # (N,) depth sort permutation: sorted[i] = orig[order[i]]
    pair_gauss: jax.Array  # (C + chunk,) depth-sorted gaussian idx; == N => dead
    pair_orig: jax.Array  # (C + chunk,) ORIGINAL gaussian id per CSR slot;
    #     == N => dead slot. Rides the binning sort so the gradient
    #     reduction can key on it and emit per-Gaussian sums directly in
    #     original parameter order — no N-scale un-permute afterwards.
    starts: jax.Array  # (T_padded + 1,) dense range starts per tile
    counts: jax.Array  # (T_padded,) per-tile LIVE pair counts; with exact
    #     culling this is <= diff(starts) — the slots
    #     [starts[t] + counts[t], starts[t+1]) hold culled pairs
    #     (pair_gauss == N, zero payload, exact-zero gradients)
    gauss_starts: jax.Array  # (N + 1,) per-Gaussian pre-sort pair ranges
    #     (depth-sorted gaussian order — the expand_segments boundaries)
    orig_starts: jax.Array  # (N + 1,) per-ORIGINAL-gaussian segment starts of
    #     the gradient-reduction sort keyed on pair_orig
    spatial_perm: jax.Array  # (N,) grouping order of gauss_starts (identity)
    total_pairs: jax.Array  # () int32 — raw total (overflow diagnostic)
    piece_bounds: jax.Array  # (KP + 1,) slab offsets of the reduction
    #     pieces (tile-boundary-aligned, pair-balanced); [0, total] when
    #     KP == 1
    piece_starts: jax.Array  # (KP, N + 1) piece-LOCAL per-original-
    #     gaussian segment starts (== orig_starts[None] when KP == 1)
    piece_ok: jax.Array  # () bool — every piece fits piece_capacity
    #     (the backward cond-falls back to the monolithic sort if not)


def _exclusive_cumprod(x: jax.Array, axis: int) -> jax.Array:
    cp = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(cp, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )


def bin_gaussians(
    cfg: RasterizeConfig,
    means2d: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    validf: jax.Array,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    order: jax.Array | None = None,
    fields_sorted: jax.Array | None = None,
) -> _Binned:
    """Global depth sort + dense CSR tile pair list in ONE sort.

    Stages (all static shapes):
      1. depth argsort; per-Gaussian tile bbox + pair counts; Gaussians
         whose pair range does not fit `pair_capacity` drop whole —
         deepest first under the depth-presorted schemes (graceful
         degradation). Under "depthq" there is no pre-sort, so the
         drop order is ORIGINAL ARRAY order: near-camera splats can
         drop while far ones survive. Overflow is rare by construction
         (the Trainer auto-sizes capacity with margin) and
         total_pairs surfaces it; rank-by-depth would need exactly the
         N-scale depth sort depthq exists to avoid.
      2. per-TILE pair counts WITHOUT expansion: a separable
         interval-membership matmul over the tile grid (corner-scatter
         summed-area fallback) — `starts` is its exclusive cumsum.
      3. expansion to per-pair keys `tile * (N+1) + gauss`; one flat
         int32 sort then yields the dense CSR directly and
         `sorted_key % (N+1)` decodes the per-pair gaussian index.
         Dead lanes (pos >= total) carry the sentinel key and land past
         starts[-1]; a sentinel `chunk` tail is appended post-sort for
         kernel DMA overrun room.

    `order` + `fields_sorted` (the pallas payload table, already
    depth-sorted, with radii_x/radii_y/validf in rows 13..15 — see
    _raster_fwd) skip the internal per-array gathers: N-row gathers cost
    ~7 ms each at N=1M, so the caller gathers ONCE and both binning and
    the pair-payload build slice the same table.
    """
    n = means2d.shape[0]
    ts = cfg.tile_size
    k = cfg.chunk
    c = cfg.pair_capacity
    if cfg.backend == "pallas":
        # the backward's staged head-window merge indexes chunk-wide
        # windows (the XLA backend has no such constraint)
        assert c % k == 0, "pair_capacity must be a multiple of chunk"
    t_pad = cfg.n_tiles_padded
    valid = validf > 0.5

    depthq = cfg.sort_scheme == "depthq"
    if depthq:
        # No global pre-sort: "sorted" views ARE the original arrays
        # (depth ordering moves into the sort key).
        qbits = 32 - max(int(t_pad + 1).bit_length(), 1)
        assert qbits >= 14, (
            f"depthq needs >= 14 depth bits, got {qbits} at "
            f"{t_pad} padded tiles; use sort_scheme='auto'"
        )
        assert n < (1 << 24), "depthq rides gaussian ids through f32 expand"
        order = jnp.arange(n, dtype=jnp.int32)
        m2d_s = means2d
        rad_s = radii if radii.ndim == 2 else (
            radii[:, None] * jnp.ones((1, 2), radii.dtype)
        )
        valid_s = valid
    elif order is None:
        order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    if depthq:
        pass
    elif fields_sorted is not None:
        m2d_s = fields_sorted[:, 0:2]
        rad_s = fields_sorted[:, 13:15]
        valid_s = fields_sorted[:, 15] > 0.5
    else:
        m2d_s = means2d[order]
        rad_s = radii[order]  # (N, 2) per-axis extents (or broadcast)
        if rad_s.ndim == 1:
            rad_s = rad_s[:, None] * jnp.ones((1, 2), rad_s.dtype)
        valid_s = valid[order]

    x0 = jnp.clip(
        jnp.floor((m2d_s[:, 0] - rad_s[:, 0]) / ts).astype(jnp.int32),
        0, cfg.tiles_x
    )
    x1 = jnp.clip(
        jnp.floor((m2d_s[:, 0] + rad_s[:, 0]) / ts).astype(jnp.int32) + 1,
        0, cfg.tiles_x
    )
    y0 = jnp.clip(
        jnp.floor((m2d_s[:, 1] - rad_s[:, 1]) / ts).astype(jnp.int32),
        0, cfg.tiles_y
    )
    y1 = jnp.clip(
        jnp.floor((m2d_s[:, 1] + rad_s[:, 1]) / ts).astype(jnp.int32) + 1,
        0, cfg.tiles_y
    )
    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    counts_g = jnp.where(valid_s, w * h, 0).astype(jnp.int32)
    offs_raw = jnp.cumsum(counts_g) - counts_g
    total_raw = offs_raw[-1] + counts_g[-1] if n > 0 else jnp.zeros((), jnp.int32)
    # Overflow: drop whole Gaussians whose range does not fit, so the
    # histogram (stage 2) stays exactly consistent with the emitted pairs.
    fits = (offs_raw + counts_g) <= c
    counts_g = jnp.where(fits, counts_g, 0)
    offsets = jnp.cumsum(counts_g) - counts_g
    total = offsets[-1] + counts_g[-1] if n > 0 else jnp.zeros((), jnp.int32)

    # --- stage 2: per-tile counts WITHOUT expansion ---
    # The rectangle histogram is SEPARABLE: counts2d[ty, tx] =
    # sum_g [y0<=ty<y1][x0<=tx<x1] — a rank-N outer-product sum, i.e. one
    # (tiles_y, N) @ (N, tiles_x) matmul of 0/1 interval-membership
    # matrices on the MXU (exact integers in f32 below 2^24). Measured
    # ~0.2 ms at N=100k vs ~3.5 ms for the corner-scatter + summed-area
    # formulation it replaces (the 4N-row scatter serializes at ~9 ns/row
    # on TPU). Falls back to the corner trick when the compare/matmul
    # volume or the count range would blow up.
    keep = counts_g > 0
    if n < (1 << 24) and n * cfg.n_tiles <= (1 << 34):
        ty = jnp.arange(cfg.tiles_y, dtype=jnp.int32)[None, :]
        tx = jnp.arange(cfg.tiles_x, dtype=jnp.int32)[None, :]
        a_y = ((y0[:, None] <= ty) & (ty < y1[:, None])
               & keep[:, None]).astype(jnp.float32)  # (N, tiles_y)
        b_x = ((x0[:, None] <= tx) & (tx < x1[:, None])).astype(jnp.float32)
        counts2d = jnp.einsum(
            "gy,gx->yx", a_y, b_x, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        tile_counts = counts2d.reshape(-1)
    else:
        gx = cfg.tiles_x + 1
        gy = cfg.tiles_y + 1
        corner_idx = jnp.concatenate(
            [y0 * gx + x0, y0 * gx + x1, y1 * gx + x0, y1 * gx + x1]
        )
        one = jnp.where(keep, 1, 0).astype(jnp.int32)
        corner_val = jnp.concatenate([one, -one, -one, one])
        grid = jnp.zeros((gy * gx,), jnp.int32).at[corner_idx].add(corner_val)
        counts2d = jnp.cumsum(
            jnp.cumsum(grid.reshape(gy, gx), axis=0), axis=1
        )
        tile_counts = counts2d[: cfg.tiles_y, : cfg.tiles_x].reshape(-1)
    if t_pad > cfg.n_tiles:
        tile_counts = jnp.concatenate(
            [tile_counts, jnp.zeros((t_pad - cfg.n_tiles,), jnp.int32)]
        )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tile_counts).astype(jnp.int32)]
    )

    # --- stage 3: expansion + one sort ---
    # Per-pair fields [gauss, offset, bbox w, packed x0/y0] materialize as
    # piecewise-constant sequences over the pair axis (TPU gathers at C
    # scale run ~4 ms/M rows, so the old repeat + table-gather
    # formulation cost ~40 ms/frame at 2M pairs).
    spatial_perm = jnp.arange(n, dtype=jnp.int32)

    pos = jnp.arange(c, dtype=jnp.int32)
    live = pos < total
    xy = x0 * 4096 + y0
    # Row 4 expands each pair's ORIGINAL gaussian id: it rides the
    # binning sort (replacing the old pre-sort pair position) so the
    # backward's gradient-reduction sort can key on it directly and
    # emit per-Gaussian sums already in original order. Under depthq
    # row 0 already IS the original id (identity order), so row 4
    # carries the quantized depth for the sort key instead.
    if depthq:
        qmax = (1 << qbits) - 1
        dmin = jnp.min(jnp.where(valid, depths, jnp.inf))
        dmax = jnp.max(jnp.where(valid, depths, -jnp.inf))
        dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        dmax = jnp.where(jnp.isfinite(dmax), dmax, 0.0)
        span = jnp.maximum(dmax - dmin, 1e-12)
        qdf = jnp.clip(
            jnp.round((depths - dmin) / span * (qmax - 1)),
            0.0, float(qmax - 1),
        )
        row4 = jnp.where(valid, qdf, 0.0).astype(jnp.int32)
    else:
        row4 = order.astype(jnp.int32)
    # The expand streams its value rows from HBM at C scale — one row
    # is ~2.7 ms at C=5.24M (perf/tpu_r4_probe4.py chunk sweep), so the
    # three bbox fields pack into ONE row when they fit 24 bits
    # ((x0*128 + y0)*256 + w stays f32-exact below 2^24 for tile grids
    # up to 127x127 — every <=2K-wide image at tile 16).
    pack_xyw = cfg.tiles_x < 128 and cfg.tiles_y < 128
    if pack_xyw:
        xyw = (x0 * 128 + y0) * 256 + jnp.maximum(w, 1)
        vals = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32), offsets, xyw, row4], axis=0
        )  # (4, N) field-major
    else:
        vals = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32), offsets, jnp.maximum(w, 1),
             xy, row4],
            axis=0,
        )  # (5, N) field-major
    gauss_starts = jnp.concatenate([offsets, total[None]]).astype(jnp.int32)
    # expand_segments is exact for int rows < 2^24 and any f32 rows; it
    # streams the value table from HBM when N exceeds VMEM residency, so
    # the only bounds are the f32-integer ceilings.
    pallas_expand = (cfg.backend == "pallas" and c < (1 << 24)
                     and n < (1 << 24))
    # NOTE: culling requires the pallas expand path (capacity and N
    # < 2^24); outside those bounds an exact_cull request silently
    # no-ops (the layout stays correct).
    cull = (cfg.exact_cull and pallas_expand and conics is not None
            and opacities is not None)
    pair_flds = None
    if pallas_expand:
        # Per-pair fields via the expand_segments kernel: VMEM-resident
        # value/boundary tables + 128-Gaussian membership-window matmuls
        # per output chunk — replaces the XLA delta-scatter (+ prefix
        # sweep) whose 100k-row scatter serializes (~2.6 ms total at
        # 1.6M pairs). Dead lanes (pos >= total) read zeros; they are
        # overridden by the sentinel key below.
        from dnsplatter_tpu.ops import rasterize_pallas as rp

        if cull:
            # One combined f32 expansion: 4 int rows (exact in f32 below
            # 2^24) + 6 geometry rows for the exact ellipse-tile test.
            if depthq:
                con_s = conics
                op_s = jnp.where(valid, opacities, 0.0)
            elif fields_sorted is not None:
                con_s = fields_sorted[:, 2:5]
                op_s = fields_sorted[:, 5]  # already validity-masked
            else:
                con_s = conics[order]
                op_s = jnp.where(valid_s, opacities[order], 0.0)
            thr = jnp.log(jnp.maximum(op_s, 1e-12) * 255.0)
            allvals = jnp.concatenate([
                vals.astype(jnp.float32),
                jnp.stack([m2d_s[:, 0], m2d_s[:, 1], con_s[:, 0],
                           con_s[:, 1], con_s[:, 2], thr], axis=0),
            ], axis=0)  # (4-or-5 int rows + 6 geometry rows, N) — int
            # row count tracks pack_xyw (vals.shape[0]); slicing below
            # uses it, never a literal
            accf = rp.expand_segments(allvals, gauss_starts, c,
                                      out_dtype=jnp.float32)
            acc = accf[:vals.shape[0]].astype(jnp.int32)
            pair_flds = accf[vals.shape[0]:]
        else:
            acc = rp.expand_segments(vals, gauss_starts, c)
    else:
        diffs = jnp.concatenate(
            [vals[:, :1], vals[:, 1:] - vals[:, :-1]], axis=1
        )
        table = jnp.zeros((vals.shape[0], c), jnp.int32).at[:, offsets].add(
            diffs, mode="drop"
        )
        if cfg.backend == "pallas" and c < (1 << 24):
            from dnsplatter_tpu.ops import rasterize_pallas as rp

            acc = rp.cumsum_lanes_i32(table)
        else:
            acc = jnp.cumsum(table, axis=1)
    pair_gauss0 = acc[0]
    rank = pos - acc[1]
    if pack_xyw:
        wg = jnp.maximum(acc[2] % 256, 1)
        x0p = acc[2] // 32768
        y0p = (acc[2] // 256) % 128
        row4_pair = acc[3]
    else:
        wg = jnp.maximum(acc[2], 1)
        x0p = acc[3] // 4096
        y0p = acc[3] % 4096
        row4_pair = acc[4]
    # original gaussian id per pre-sort pair (== row 0 under depthq)
    orig0 = pair_gauss0 if depthq else row4_pair
    tile_id = x0p + rank % wg + (y0p + rank // wg) * cfg.tiles_x
    tile_id = jnp.clip(tile_id, 0, t_pad)  # dead-lane overflow insurance

    big = n + 1

    survive = None
    if cull:
        # Exact ellipse-tile test: min of the PD quadratic sigma over the
        # tile square (center if inside, else 4 clamped edge minimizers);
        # the pair survives iff op * exp(-sigma_min) can reach 1/255,
        # i.e. sigma_min <= log(255 * op). +1e-3 margin keeps borderline
        # pairs so float rounding can only under-cull, never over-cull.
        pmx, pmy, pa, pb, pcc, pthr = (pair_flds[i] for i in range(6))
        ts_f = jnp.float32(ts)
        ax0 = (tile_id % cfg.tiles_x).astype(jnp.float32) * ts_f - pmx
        ay0 = (tile_id // cfg.tiles_x).astype(jnp.float32) * ts_f - pmy
        ax1 = ax0 + ts_f
        ay1 = ay0 + ts_f
        a_ = jnp.maximum(pa, 1e-12)
        c_ = jnp.maximum(pcc, 1e-12)

        def _sig(dx, dy):
            return 0.5 * (a_ * dx * dx + c_ * dy * dy) + pb * dx * dy

        def _edge_x(dx):  # fixed dx, minimize over dy in [ay0, ay1]
            return _sig(dx, jnp.clip(-pb * dx / c_, ay0, ay1))

        def _edge_y(dy):  # fixed dy, minimize over dx in [ax0, ax1]
            return _sig(jnp.clip(-pb * dy / a_, ax0, ax1), dy)

        smin = jnp.minimum(
            jnp.minimum(_edge_x(ax0), _edge_x(ax1)),
            jnp.minimum(_edge_y(ay0), _edge_y(ay1)),
        )
        inside = (ax0 <= 0.0) & (0.0 <= ax1) & (ay0 <= 0.0) & (0.0 <= ay1)
        smin = jnp.where(inside, 0.0, smin)
        survive = smin <= pthr + 1e-3

    # The sort also carries each pair's ORIGINAL gaussian id (dead slots
    # get the sentinel N): the backward's gradient-reduction sort keys on
    # it, so per-Gaussian gradient segments come out directly in original
    # parameter order — the former N-scale 15-column un-permute sort
    # (8.9 ms at N=1M) disappears. Segment boundaries are `orig_starts`.
    ov = jnp.where(live, orig0, n)
    scheme = cfg.sort_scheme
    if scheme == "depthq":
        # uint32 key = tile * 2^qb + quantized depth; the gaussian id
        # rides as payload (it cannot be decoded from the key). Culled
        # and dead lanes take qdepth == qmax (> any real value), so
        # they land at each tile's tail / past the last tile exactly
        # like the packed schemes' sentinel-gauss keys. INVARIANT
        # EXCEPTION (depthq only): culled-live lanes keep their REAL
        # gaussian id in pair_gauss/pair_orig (the packed schemes write
        # sentinel N) — position past the shrunken tile_counts is what
        # marks them culled. The kernels mask via jj < cnt so this is
        # invisible to them; any NEW consumer of pair_gauss must bound
        # by counts, not by the sentinel.
        qd_pair = row4_pair
        bigq = jnp.uint32(qmax + 1)
        sentinel = jnp.uint32(t_pad) * bigq + jnp.uint32(qmax)
        key_real = jnp.where(
            live,
            tile_id.astype(jnp.uint32) * bigq + qd_pair.astype(jnp.uint32),
            sentinel,
        )
        if cull:
            key_real = jnp.where(
                live & ~survive,
                tile_id.astype(jnp.uint32) * bigq + jnp.uint32(qmax),
                key_real,
            )
        keys, pair_gauss = jax.lax.sort((key_real, ov), num_keys=1)
        pair_orig = pair_gauss  # identity order: same ids
        if cull:
            bounds = (jnp.arange(t_pad, dtype=jnp.uint32) * bigq
                      + jnp.uint32(qmax))
            surv_end = jnp.searchsorted(
                keys, bounds, side="left"
            ).astype(jnp.int32)
            tile_counts = surv_end - starts[:-1]
    elif scheme == "auto":
        if (t_pad + 1) * big <= jnp.iinfo(jnp.int32).max:
            scheme = "packed"
        elif (t_pad + 1) * big <= jnp.iinfo(jnp.uint32).max:
            scheme = "packed32"
        else:
            scheme = "tilekey"
    if scheme == "depthq":
        pass  # sorted above
    elif scheme == "packed":
        assert (t_pad + 1) * big <= jnp.iinfo(jnp.int32).max, (
            "packed sort key overflows int32 at this (tiles, N); use "
            "sort_scheme='tilekey'"
        )
        sentinel = jnp.int32(t_pad * big + n)
        key_real = jnp.where(live, tile_id * big + pair_gauss0, sentinel)
        if cull:
            # Culled pairs keep their slot inside the tile's range (the
            # histogram counted the full rects) but take the tile's own
            # sentinel gauss id: they sort to the range's tail, decode to
            # pair_gauss == N (zero payload row), and the shrunken counts
            # below let the kernels skip them.
            key_real = jnp.where(
                live & ~survive, tile_id * big + n, key_real
            )
        keys, pair_orig = jax.lax.sort((key_real, ov), num_keys=1)
        pair_gauss = (keys % big).astype(jnp.int32)
        if cull:
            bounds = jnp.arange(t_pad, dtype=jnp.int32) * big + n
            surv_end = jnp.searchsorted(
                keys, bounds, side="left"
            ).astype(jnp.int32)
            tile_counts = surv_end - starts[:-1]
    elif scheme == "packed32":
        # Same packed single-key sort in UNSIGNED 32-bit: one extra bit
        # doubles the (tiles+1)*(N+1) ceiling to 2^32, covering the
        # reference-default N=1M at the bench tiling (2305 * (N+1) <=
        # 2^32 -> N <= 1.86M). One unstable 2-column sort vs tilekey's
        # stable 3-column sort: ~9 ms/frame cheaper at 5.24M pairs.
        assert (t_pad + 1) * big <= jnp.iinfo(jnp.uint32).max, (
            "packed32 sort key overflows uint32 at this (tiles, N); use "
            "sort_scheme='tilekey'"
        )
        bigu = jnp.uint32(big)
        sentinel = jnp.uint32(t_pad) * bigu + jnp.uint32(n)
        key_real = jnp.where(
            live,
            tile_id.astype(jnp.uint32) * bigu
            + pair_gauss0.astype(jnp.uint32),
            sentinel,
        )
        if cull:
            key_real = jnp.where(
                live & ~survive,
                tile_id.astype(jnp.uint32) * bigu + jnp.uint32(n),
                key_real,
            )
        keys, pair_orig = jax.lax.sort((key_real, ov), num_keys=1)
        pair_gauss = (keys % bigu).astype(jnp.int32)
        if cull:
            bounds = (jnp.arange(t_pad, dtype=jnp.uint32) * bigu
                      + jnp.uint32(n))
            surv_end = jnp.searchsorted(
                keys, bounds, side="left"
            ).astype(jnp.int32)
            tile_counts = surv_end - starts[:-1]
    else:
        # tilekey: STABLE sort on `tile*2 + cullbit` only. Within a tile,
        # pre-sort pair order already ascends in gaussian (= depth)
        # order, so stability yields exactly the packed layout; the
        # gaussian index rides as payload instead of decoding from the
        # key. Works for any N (no int32 packing ceiling).
        sentinel = jnp.int32(2 * t_pad + 2)
        key_real = jnp.where(live, tile_id * 2, sentinel)
        gv = jnp.where(live, pair_gauss0, n)
        if cull:
            key_real = jnp.where(live & ~survive, tile_id * 2 + 1, key_real)
            gv = jnp.where(live & ~survive, n, gv)
        keys, pair_gauss, pair_orig = jax.lax.sort(
            (key_real, gv, ov), num_keys=1, is_stable=True
        )
        if cull:
            bounds = jnp.arange(t_pad, dtype=jnp.int32) * 2 + 1
            surv_end = jnp.searchsorted(
                keys, bounds, side="left"
            ).astype(jnp.int32)
            tile_counts = surv_end - starts[:-1]

    # Sentinel chunk tail: kernel DMA windows start at the preceding
    # 128-lane boundary and may overrun a tile's end by < chunk lanes.
    pair_gauss = jnp.concatenate(
        [pair_gauss, jnp.full((k,), n, jnp.int32)]
    )
    pair_orig = jnp.concatenate([pair_orig, jnp.full((k,), n, jnp.int32)])

    # Per-ORIGINAL-gaussian pair counts. Fast path (no capacity
    # overflow — the auto-sized default): recompute the identical
    # elementwise bbox math directly on the UNSORTED inputs, which is
    # exactly counts_g un-permuted. Overflow path: the `fits` drop
    # depends on the depth-sorted prefix sums, so permuting counts_g
    # back rides an N-scale key+1 sort (order is a permutation of
    # [0, N); a direct .at[order].set scatter serializes at
    # ~20-25 ns/row).
    rad_u = radii if radii.ndim == 2 else (
        radii[:, None] * jnp.ones((1, 2), radii.dtype)
    )
    x0u = jnp.clip(jnp.floor((means2d[:, 0] - rad_u[:, 0]) / ts)
                   .astype(jnp.int32), 0, cfg.tiles_x)
    x1u = jnp.clip(jnp.floor((means2d[:, 0] + rad_u[:, 0]) / ts)
                   .astype(jnp.int32) + 1, 0, cfg.tiles_x)
    y0u = jnp.clip(jnp.floor((means2d[:, 1] - rad_u[:, 1]) / ts)
                   .astype(jnp.int32), 0, cfg.tiles_y)
    y1u = jnp.clip(jnp.floor((means2d[:, 1] + rad_u[:, 1]) / ts)
                   .astype(jnp.int32) + 1, 0, cfg.tiles_y)
    counts_orig_raw = jnp.where(
        valid,
        jnp.maximum(x1u - x0u, 0) * jnp.maximum(y1u - y0u, 0),
        0,
    ).astype(jnp.int32)
    if depthq:
        # identity order: counts_g is already per-ORIGINAL-gaussian
        # (including any overflow drops).
        counts_orig = counts_g
    else:
        counts_orig = jax.lax.cond(
            total_raw <= c,
            lambda _: counts_orig_raw,
            lambda _: jax.lax.sort(
                (order.astype(jnp.int32), counts_g), num_keys=1
            )[1],
            None,
        )
    orig_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts_orig).astype(jnp.int32)]
    )

    # Piecewise-reduction structure: KP pair-balanced tile-boundary
    # pieces. Per-original-gaussian counts inside a tile-id interval are
    # closed-form from the bbox (full rows below the boundary row plus
    # the boundary row's column overlap) — exactly the slots the CSR
    # materializes, including culled (sentinel-gauss) slots, masked to
    # zero for overflow-dropped gaussians via counts_orig.
    kp = cfg.n_reduce_pieces
    if kp > 1:
        targets = (jnp.arange(1, kp, dtype=jnp.int32)
                   * jnp.int32(c // kp))
        tj = jnp.searchsorted(starts, targets, side="left").astype(jnp.int32)
        tjf = jnp.concatenate([
            jnp.zeros((1,), jnp.int32), tj,
            jnp.full((1,), t_pad, jnp.int32),
        ])
        piece_bounds = starts[tjf]  # (KP + 1,)

        emitted = counts_orig > 0

        def cnt_lt(bnd):
            rb = bnd // cfg.tiles_x
            cb = bnd % cfg.tiles_x
            wu = jnp.maximum(x1u - x0u, 0)
            full = wu * jnp.clip(jnp.minimum(y1u, rb) - y0u, 0, None)
            part = jnp.where(
                (y0u <= rb) & (rb < y1u),
                jnp.clip(jnp.minimum(x1u, cb) - x0u, 0, None), 0,
            )
            return jnp.where(emitted, full + part, 0).astype(jnp.int32)

        cls = [cnt_lt(tjf[j]) for j in range(kp + 1)]
        piece_counts = jnp.stack(
            [cls[j + 1] - cls[j] for j in range(kp)], axis=0
        )  # (KP, N)
        piece_starts = jnp.concatenate([
            jnp.zeros((kp, 1), jnp.int32),
            jnp.cumsum(piece_counts, axis=1).astype(jnp.int32),
        ], axis=1)
        piece_len = piece_bounds[1:] - piece_bounds[:-1]
        # The reduction extracts each piece as whole chunk-aligned
        # windows (no cross-lane rotate), so a piece occupies
        # [pj % chunk, pj % chunk + len) inside its static slice.
        piece_ok = jnp.all(
            piece_bounds[:-1] % k + piece_len <= cfg.piece_capacity
        )
    else:
        piece_bounds = jnp.stack(
            [jnp.zeros((), jnp.int32), starts[-1]]
        )
        piece_starts = orig_starts[None, :]
        piece_ok = jnp.ones((), bool)

    return _Binned(
        order=order,
        pair_gauss=pair_gauss,
        pair_orig=pair_orig,
        starts=starts,
        counts=tile_counts,
        gauss_starts=gauss_starts,
        orig_starts=orig_starts,
        spatial_perm=spatial_perm,
        total_pairs=total_raw,
        piece_bounds=piece_bounds,
        piece_starts=piece_starts,
        piece_ok=piece_ok,
    )


def _tile_pixel_coords(cfg: RasterizeConfig, tile_ids: jax.Array) -> jax.Array:
    """(TB, P, 2) pixel-center coordinates for a block of tiles."""
    ts = cfg.tile_size
    ty = tile_ids // cfg.tiles_x
    tx = tile_ids % cfg.tiles_x
    local = jnp.arange(ts * ts, dtype=jnp.float32)
    lx = local % ts
    ly = local // ts
    px = tx[:, None].astype(jnp.float32) * ts + lx[None, :] + 0.5
    py = ty[:, None].astype(jnp.float32) * ts + ly[None, :] + 0.5
    return jnp.stack([px, py], axis=-1)


def _gather_chunk(binned, sorted_arrays, starts, ends, chunk_idx, k):
    """Gather one K-chunk of pair data for a block of tiles (XLA backend).

    Returns per-array (TB, K, ...) gathers plus the in-tile mask and the
    global in-tile pair position j (TB, K).
    """
    tb = starts.shape[0]
    n = sorted_arrays[0].shape[0]
    j = chunk_idx * k + jnp.arange(k, dtype=jnp.int32)[None, :]  # (1, K) in-tile
    idx = starts[:, None] + j  # (TB, K) global pair index
    in_range = idx < ends[:, None]
    idx = jnp.minimum(idx, binned.pair_gauss.shape[0] - 1)
    g = jnp.minimum(binned.pair_gauss[idx], n - 1)  # clip dummy index N
    gathered = [a[g] for a in sorted_arrays]
    return gathered, in_range, jnp.broadcast_to(j, (tb, k)), g


def _chunk_alpha(pix, g_m2d, g_con, g_opac, mask):
    """(TB, P, K) alpha + hit mask for one chunk against one pixel block."""
    dx = pix[:, :, None, 0] - g_m2d[:, None, :, 0]
    dy = pix[:, :, None, 1] - g_m2d[:, None, :, 1]
    a = g_con[:, None, :, 0]
    b = g_con[:, None, :, 1]
    c = g_con[:, None, :, 2]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, g_opac[:, None, :] * jnp.exp(-sigma))
    hit = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & mask[:, None, :]
    return alpha, hit, dx, dy, sigma


def _rasterize_forward(cfg: RasterizeConfig, binned: _Binned, sorted_data):
    """Tiled forward compositing (XLA backend).

    Returns padded (T_padded, P, F) accumulated features, (T_padded, P)
    T_final, and int32 last-contributor in-tile index (-1 none).
    """
    m2d_s, con_s, opac_s, feat_s = sorted_data
    k = cfg.chunk
    tb = cfg.tile_block
    p = cfg.tile_size * cfg.tile_size
    f = feat_s.shape[-1]

    def block_fn(_, block_idx):
        tile_ids = block_idx * tb + jnp.arange(tb, dtype=jnp.int32)
        starts = binned.starts[tile_ids]
        ends = starts + binned.counts[tile_ids]
        pix = _tile_pixel_coords(cfg, tile_ids)  # (TB, P, 2)
        n_chunks = jnp.max(-(-(ends - starts) // k))

        def chunk_fn(ci, carry):
            t_run, done, out, last = carry
            (gm, gc, go, gf), mask, j, _ = _gather_chunk(
                binned, (m2d_s, con_s, opac_s, feat_s), starts, ends, ci, k
            )
            alpha, hit, _, _, _ = _chunk_alpha(pix, gm, gc, go, mask)
            alpha_eff = jnp.where(hit, alpha, 0.0)
            cp = _exclusive_cumprod(1.0 - alpha_eff, axis=2)  # prod_{j<k}
            t_prev = t_run[:, :, None] * cp
            next_t = t_prev * (1.0 - alpha_eff)
            would_term = hit & (next_t <= TRANSMITTANCE_EPS)
            term_before = (
                jnp.cumsum(would_term.astype(jnp.int32), axis=2)
                - would_term.astype(jnp.int32)
            ) > 0
            accept = hit & ~done[:, :, None] & ~term_before & ~would_term
            wgt = jnp.where(accept, alpha * t_prev, 0.0)  # (TB, P, K)
            out = out + jnp.einsum(
                "tpk,tkf->tpf", wgt, gf, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # no bf16 MXU inputs
            )
            t_run = t_run * jnp.prod(
                1.0 - jnp.where(accept, alpha, 0.0), axis=2
            )
            done = done | jnp.any(would_term, axis=2)
            last = jnp.maximum(
                last, jnp.max(jnp.where(accept, j[:, None, :], -1), axis=2)
            )
            return t_run, done, out, last

        init = (
            jnp.ones((tb, p), jnp.float32),
            jnp.zeros((tb, p), bool),
            jnp.zeros((tb, p, f), jnp.float32),
            jnp.full((tb, p), -1, jnp.int32),
        )
        t_run, done, out, last = jax.lax.fori_loop(0, n_chunks, chunk_fn, init)
        return None, (out, t_run, last)

    _, (out, t_final, last) = jax.lax.scan(
        block_fn, None, jnp.arange(cfg.n_blocks, dtype=jnp.int32)
    )
    return (
        out.reshape(cfg.n_tiles_padded, p, f),
        t_final.reshape(cfg.n_tiles_padded, p),
        last.reshape(cfg.n_tiles_padded, p),
    )


def _tiles_to_image(cfg: RasterizeConfig, tiles: jax.Array) -> jax.Array:
    """(T_padded, P, F) tile-major buffer -> (H, W, F) cropped image."""
    ts = cfg.tile_size
    f = tiles.shape[-1]
    full = tiles[: cfg.n_tiles].reshape(cfg.n_tiles, ts, ts, f)
    img = full.reshape(cfg.tiles_y, cfg.tiles_x, ts, ts, f)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        cfg.tiles_y * ts, cfg.tiles_x * ts, f
    )
    return img[: cfg.height, : cfg.width]


def _image_to_tiles(cfg: RasterizeConfig, img: jax.Array) -> jax.Array:
    """(H, W, F) -> zero-padded (T_padded, P, F) tile-major buffer."""
    ts = cfg.tile_size
    f = img.shape[-1]
    ph = cfg.tiles_y * ts - cfg.height
    pw = cfg.tiles_x * ts - cfg.width
    img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)))
    t = img.reshape(cfg.tiles_y, ts, cfg.tiles_x, ts, f)
    t = t.transpose(0, 2, 1, 3, 4).reshape(cfg.n_tiles, ts * ts, f)
    pad_tiles = cfg.n_tiles_padded - cfg.n_tiles
    if pad_tiles:
        t = jnp.concatenate(
            [t, jnp.zeros((pad_tiles, ts * ts, f), t.dtype)], axis=0
        )
    return t


# ---------------------------------------------------------------------------
# custom-VJP core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_core(cfg, means2d, conics, opacities, features, absgrad_sink,
                    depths, radii, validf):
    out, _ = _raster_fwd(cfg, means2d, conics, opacities, features,
                         absgrad_sink, depths, radii, validf)
    return out


def _raster_fwd(cfg, means2d, conics, opacities, features, absgrad_sink,
                depths, radii, validf):
    del absgrad_sink
    if cfg.backend == "pallas" and features.shape[-1] <= 7:
        # ONE depth-order row gather serves BOTH binning and the pair
        # payload: the (N, 16) table carries the kernel payload in rows
        # 0..12 and the binning geometry (radii_x, radii_y, validf) in
        # rows 13..15 (the kernels never read past 6 + F; per-row access
        # cost dominates N-scale gathers — ~7 ms per separate gather at
        # N=1M, perf/tpu_micro_1m.py).
        from dnsplatter_tpu.ops import rasterize_pallas as rp

        n = means2d.shape[0]
        f = features.shape[-1]
        rad2 = radii if radii.ndim == 2 else jnp.stack([radii, radii], -1)
        opac_masked = jnp.where(validf > 0.5, opacities, 0.0)
        if cfg.sort_scheme == "depthq":
            # No depth pre-sort at all: gaussians keep their original
            # order (depth rides in the sort key), so the N-scale
            # argsort AND the (N, 16) depth-order row gather both
            # disappear — the payload table is just a concat of the
            # original arrays.
            fields_s = jnp.concatenate(
                [means2d, conics, opac_masked[:, None], features],
                axis=-1,
            )  # (N, 6 + F), original order
            binned = bin_gaussians(cfg, means2d, depths, radii, validf,
                                   conics=conics, opacities=opacities)
            return _raster_fwd_pallas(cfg, binned, fields_s, f, n)
        fields = jnp.concatenate(
            [means2d, conics, opac_masked[:, None], features,
             jnp.zeros((n, 13 - 6 - f), jnp.float32),
             rad2, validf[:, None]],
            axis=-1,
        )
        order = jnp.argsort(jnp.where(validf > 0.5, depths, jnp.inf))
        fields_s = fields[order]
        binned = bin_gaussians(cfg, means2d, depths, radii, validf,
                               conics=conics, opacities=opacities,
                               order=order, fields_sorted=fields_s)
        return _raster_fwd_pallas(cfg, binned, fields_s, f, n)
    binned = bin_gaussians(cfg, means2d, depths, radii, validf,
                           conics=conics, opacities=opacities)
    if cfg.backend == "pallas":
        # large-F fallback: separate gathers (radii/valid rows don't fit)
        from dnsplatter_tpu.ops import rasterize_pallas as rp

        n = means2d.shape[0]
        f = features.shape[-1]
        assert f <= rp.MAX_FEATS
        opac_masked = jnp.where(validf > 0.5, opacities, 0.0)
        fields = jnp.concatenate(
            [means2d, conics, opac_masked[:, None], features,
             jnp.zeros((n, rp.PW - 6 - f), jnp.float32)],
            axis=-1,
        )
        fields_s = fields[binned.order]
        return _raster_fwd_pallas(cfg, binned, fields_s, f, n)
    m2d_s = means2d[binned.order]
    con_s = conics[binned.order]
    opac_s = jnp.where(validf[binned.order] > 0.5, opacities[binned.order], 0.0)
    feat_s = features[binned.order]
    tiles_out, t_final, last = _rasterize_forward(
        cfg, binned, (m2d_s, con_s, opac_s, feat_s)
    )
    image = _tiles_to_image(cfg, tiles_out)
    alpha = _tiles_to_image(cfg, (1.0 - t_final)[..., None])
    residuals = (binned, m2d_s, con_s, opac_s, feat_s, t_final, last,
                 means2d.shape[0])
    return (image, alpha), residuals


def _raster_fwd_pallas(cfg, binned, fields_s, f, n):
    from dnsplatter_tpu.ops import rasterize_pallas as rp

    if jax.default_backend() == "tpu" and cfg.chunk % 128 != 0:
        raise ValueError(
            f"pallas backend on TPU needs chunk % 128 == 0 (got "
            f"{cfg.chunk}): Mosaic requires 128-lane-aligned dynamic "
            "slices"
        )

    # ONE (N+1, 6+F) row gather then a field-major transpose: Mosaic's
    # VMEM/HBM memrefs are 128-lane tiled, so the per-chunk DMA must
    # slice 128 LANES — the pair axis has to be minor. Row N of the field
    # table is zeros, the landing slot for dummy/alignment pairs. Only
    # the rows the kernels read are gathered (the C-scale gather has a
    # per-byte cost component above ~8 f32 rows: w16 ≈ 30 ms vs w8 ≈
    # 21 ms materialized at C=5.24M, perf/tpu_r4_probe2.py — the table's
    # radii/validf rows are binning-only and stay at N scale).
    pw = 6 + f
    # Mosaic DMAs need 8-aligned sublane extents: the gather stays at
    # 6+F columns (the cost saving), the zero-pad up to the next
    # multiple of 8 fuses into the transpose write.
    pw_pad = -(-pw // 8) * 8
    fields = jnp.concatenate(
        [fields_s[:, :pw], jnp.zeros((1, pw), jnp.float32)]
    )
    rows = fields[binned.pair_gauss]  # (C_al, 6+F)
    payload = jnp.pad(rows, ((0, 0), (0, pw_pad - pw))).T  # (PWpad, C_al)
    out_t, tfin_t, last_t = rp.forward_tiles(
        payload, binned.starts, binned.counts, cfg.n_tiles_padded, f,
        cfg.tile_size, cfg.tiles_x, cfg.chunk,
    )
    image = _tiles_to_image(cfg, jnp.transpose(out_t, (0, 2, 1)))
    alpha = _tiles_to_image(
        cfg, jnp.transpose(1.0 - tfin_t, (0, 2, 1))
    )
    residuals = (binned, payload, tfin_t, last_t, n)
    return (image, alpha), residuals


def _raster_bwd(cfg, residuals, cotangents):
    if cfg.backend == "pallas":
        return _raster_bwd_pallas(cfg, residuals, cotangents)
    g_image, g_alpha = cotangents
    binned, m2d_s, con_s, opac_s, feat_s, t_final, last, n = residuals
    k = cfg.chunk
    tb = cfg.tile_block
    p = cfg.tile_size * cfg.tile_size
    f = feat_s.shape[-1]

    g_out_tiles = _image_to_tiles(cfg, g_image)  # (T_padded, P, F)
    g_alpha_tiles = _image_to_tiles(cfg, g_alpha)[..., 0]  # (T_padded, P)
    t_final_b = t_final.reshape(cfg.n_blocks, tb, p)
    last_b = last.reshape(cfg.n_blocks, tb, p)
    g_out_b = g_out_tiles.reshape(cfg.n_blocks, tb, p, f)
    g_alpha_b = g_alpha_tiles.reshape(cfg.n_blocks, tb, p)

    def block_fn(carry, xs):
        gm2d, gcon, gop, gfeat, gabs = carry
        block_idx, g_out, g_alpha_pix, t_fin, last_pix = xs
        tile_ids = block_idx * tb + jnp.arange(tb, dtype=jnp.int32)
        starts = binned.starts[tile_ids]
        ends = starts + binned.counts[tile_ids]
        pix = _tile_pixel_coords(cfg, tile_ids)
        n_chunks = jnp.max(-(-(ends - starts) // k))

        # dL/dT_final from the alpha output (alpha = 1 - T_final).
        g_tfin = -g_alpha_pix  # (TB, P)

        def chunk_fn(ci_rev, carry_in):
            (gm2d, gcon, gop, gfeat, gabs, t_back, s_acc) = carry_in
            ci = n_chunks - 1 - ci_rev
            (gm, gc, go, gf), mask, j, gidx = _gather_chunk(
                binned, (m2d_s, con_s, opac_s, feat_s), starts, ends, ci, k
            )
            alpha, hit, dx, dy, _ = _chunk_alpha(pix, gm, gc, go, mask)
            accept = hit & (j[:, None, :] <= last_pix[:, :, None])
            alpha_eff = jnp.where(accept, alpha, 0.0)
            one_m = 1.0 - alpha_eff
            # T at entry of element k: T_back_in * prod_{j>=k} 1/(1-a_j) —
            # INCLUSIVE suffix product, because T_back (transmittance after
            # the chunk) already contains the (1-a_k) factor itself.
            rcp = 1.0 / one_m
            suf = jnp.flip(jnp.cumprod(jnp.flip(rcp, axis=2), axis=2), axis=2)
            t_entry = t_back[:, :, None] * suf  # (TB, P, K)
            wgt = alpha_eff * t_entry

            # Feature gradient: dL/df_k = sum_p w_pk g_pc.
            gfeat_chunk = jnp.einsum(
                "tpk,tpf->tkf", wgt, g_out, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            # fg_pk = sum_c f_kc g_pc ; Q_pk = sum_{j>k} w_pj fg_pj + carry.
            fg = jnp.einsum(
                "tpf,tkf->tpk", g_out, gf, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            wfg = wgt * fg
            q_suf = jnp.flip(jnp.cumsum(jnp.flip(wfg, axis=2), axis=2), axis=2) - wfg
            q = q_suf + s_acc[:, :, None]

            inv_one_m = rcp
            g_alpha_k = jnp.where(
                accept,
                t_entry * fg
                - q * inv_one_m
                + (g_tfin * t_fin)[:, :, None] * (-inv_one_m),
                0.0,
            )
            # alpha = min(0.999, o * exp(-sigma)): no grad when capped.
            not_capped = alpha < MAX_ALPHA
            g_sigma = jnp.where(not_capped, -alpha * g_alpha_k, 0.0)
            go_safe = jnp.maximum(go[:, None, :], 1e-12)
            g_opac_pk = jnp.where(not_capped, (alpha / go_safe) * g_alpha_k, 0.0)

            a = gc[:, None, :, 0]
            b = gc[:, None, :, 1]
            g_a = jnp.sum(g_sigma * 0.5 * dx * dx, axis=1)
            g_b = jnp.sum(g_sigma * dx * dy, axis=1)
            g_c = jnp.sum(g_sigma * 0.5 * dy * dy, axis=1)
            # sigma depends on dx = px - mx  =>  d sigma/d mx = -(a dx + b dy)
            g_mx_pk = -g_sigma * (a * dx + b * dy)
            g_my_pk = -g_sigma * (
                gc[:, None, :, 2] * dy + b * dx
            )
            g_mx = jnp.sum(g_mx_pk, axis=1)
            g_my = jnp.sum(g_my_pk, axis=1)
            g_op = jnp.sum(g_opac_pk, axis=1)

            gi = gidx.reshape(-1)
            mflat = mask.reshape(-1)
            def sadd(acc, vals):
                vals = jnp.where(
                    mflat.reshape(vals.shape[:1] + (1,) * (vals.ndim - 1)),
                    vals, 0.0,
                )
                return acc.at[gi].add(vals)

            gm2d = sadd(gm2d, jnp.stack([g_mx, g_my], -1).reshape(-1, 2))
            gcon = sadd(gcon, jnp.stack([g_a, g_b, g_c], -1).reshape(-1, 3))
            gop = sadd(gop, g_op.reshape(-1))
            gfeat = sadd(gfeat, gfeat_chunk.reshape(-1, f))
            gabs = sadd(
                gabs,
                jnp.abs(jnp.stack([g_mx, g_my], -1)).reshape(-1, 2),
            )

            # Carry to the previous (shallower) chunk.
            t_back = t_back * jnp.prod(rcp, axis=2)
            s_acc = s_acc + jnp.sum(wfg, axis=2)
            return (gm2d, gcon, gop, gfeat, gabs, t_back, s_acc)

        init = (gm2d, gcon, gop, gfeat, gabs, t_fin, jnp.zeros((tb, p)))
        out = jax.lax.fori_loop(0, n_chunks, chunk_fn, init)
        return out[:5], None

    init = (
        jnp.zeros_like(m2d_s),
        jnp.zeros_like(con_s),
        jnp.zeros_like(opac_s),
        jnp.zeros_like(feat_s),
        jnp.zeros_like(m2d_s),
    )
    (gm2d_s, gcon_s, gop_s, gfeat_s, gabs_s), _ = jax.lax.scan(
        block_fn,
        init,
        (
            jnp.arange(cfg.n_blocks, dtype=jnp.int32),
            g_out_b,
            g_alpha_b,
            t_final_b,
            last_b,
        ),
    )

    # Un-permute from depth-sorted back to original Gaussian order.
    order = binned.order
    def unsort(g):
        return jnp.zeros_like(g).at[order].set(g)

    return (
        unsort(gm2d_s),
        unsort(gcon_s),
        unsort(gop_s),
        unsort(gfeat_s),
        unsort(gabs_s),  # absgrad through the sink input
        jnp.zeros((n,), jnp.float32),  # depths: sort order not differentiated
        jnp.zeros((n, 2), jnp.float32),  # radii
        jnp.zeros((n,), jnp.float32),  # validf
    )


def _pack_bf16_2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 rows -> one int32 row holding (bf16(a) << 16 | bf16(b))."""
    hi = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return ((hi << 16) | lo).astype(jnp.int32)


def _unpack_bf16_2(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    u = w.astype(jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def _reduce_bykey(cfg, binned, grads, stage, last_t, f, n, w0):
    """Gradient reduction with live-window compaction (compact_frac > 0).

    The reference role is gsplat's backward touching only contributing
    splats (rasterize_to_pixels bwd skips past the per-pixel last
    contributor); here the same information (`last`, recorded by the
    forward) drops provably-zero slab WINDOWS before the reduction sort,
    whose cost is set by its static lane count (~2.9 ms per M rows of
    payload at C=5.24M — the single largest backward stage, see
    perf/ROOFLINE.md). Three structural changes vs the legacy path:

      * whole-window (128-lane) compaction: `jnp.take` over the window
        axis moves aligned (8, 128) tiles only — no cross-lane rotate
        (the piece-extraction trap that killed the round-4 piecewise
        reduction, perf/tpu_r4_probe8.py);
      * the staged head windows are APPENDED to the sort input, keyed
        by the same `pair_orig` windows, replacing the ~4 ms/frame
        scatter-merge RMW over the 100+ MB slab (their unowned lanes
        are integer zeros; slab lanes they would have merged into keep
        their own keys and values — the two contributions reach the
        same gaussian through the sort instead of through lane overlap);
      * keys are NOT masked for dead pairs: dead lanes inside kept
        windows carry real ids with exact-zero (±0.0 bf16) values, so
        sums are unchanged; dropped windows never meet the sort. Since
        the surviving pair multiset is data-dependent, per-gaussian
        segment boundaries have no closed form — the key-equality
        reduce kernel (reduce_segments_bykey) needs only ~N/256 coarse
        bounds from one small searchsorted.
    """
    from dnsplatter_tpu.ops import rasterize_pallas as rp

    k = cfg.chunk
    nwin = grads.shape[1] // k
    t_pad = cfg.n_tiles_padded
    nlive = 6 + f
    ru = (nlive + 1) // 2

    g_used = grads[:ru]  # (RU, C_al) int32 bf16-pair rows
    st = stage[:, :ru]  # (T_pad, RU, k) staged head windows
    keys_w = binned.pair_orig.reshape(nwin, k)
    st_keys = jnp.take(keys_w, w0, axis=0)  # (T_pad, k)

    blk = 256
    n_pad = -(-n // blk) * blk

    def run(vals, keys):
        # vals (RU, Lw) int32, keys (Lw,) int32; append the staged head
        # windows, sort by gaussian id with the id riding as an int32
        # row, and reduce by key equality.
        vals = jnp.concatenate(
            [vals, jnp.moveaxis(st, 0, 1).reshape(ru, -1)], axis=1
        )
        keys = jnp.concatenate([keys, st_keys.reshape(-1)])
        outs = jax.lax.sort(
            (keys,) + tuple(vals[i] for i in range(ru)), num_keys=1
        )
        rows = list(outs[1:]) + [outs[0]]  # key row lands at index ru
        while len(rows) < 8:
            rows.append(jnp.zeros_like(rows[0]))
        # +chunk zero-value lanes of DMA overrun room past coarse[-1]
        slab = jnp.pad(jnp.stack(rows, axis=0), ((0, 0), (0, 512)))
        qs = jnp.minimum(
            jnp.arange(n_pad // blk + 1, dtype=jnp.int32) * blk, n
        )
        coarse = jnp.searchsorted(outs[0], qs, side="left").astype(
            jnp.int32
        )
        return rp.reduce_segments_bykey(slab, coarse, ru, n, blk=blk)

    frac = cfg.compact_frac
    if frac >= 1.0:
        per = run(g_used, binned.pair_orig)
    else:
        # Live-window mask: window w survives iff ANY tile still has
        # pairs at or before its deepest contributor in w. Per tile the
        # live lanes are [starts[t], starts[t] + lc[t]); the union of
        # the window ranges is marked with a +1/-1 diff scatter (~T_pad
        # rows) and a cumsum.
        p = cfg.tile_size * cfg.tile_size
        ml = jnp.max(last_t.reshape(t_pad, p), axis=1)  # (T_pad,)
        lc = jnp.minimum(ml + 1, binned.counts)
        s = binned.starts[:-1]
        has = (lc > 0).astype(jnp.int32)
        w_hi = (s + lc + k - 1) // k  # exclusive end window
        mark = jnp.zeros((nwin + 1,), jnp.int32)
        mark = mark.at[w0].add(has).at[w_hi].add(-has)
        live_w = jnp.cumsum(mark[:-1]) > 0
        nlive_w = jnp.sum(live_w.astype(jnp.int32))
        w_cap = max(min(int(nwin * frac) + 1, nwin), 1)
        _, widx = jax.lax.sort(
            (jnp.where(live_w, 0, 1).astype(jnp.int32),
             jnp.arange(nwin, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        widx_c = widx[:w_cap]

        def compact(_):
            # Whole-window gathers: aligned (8, 128) tile moves. Over-
            # selected dead windows (when nlive_w < w_cap) carry real
            # keys with exact-zero values — harmless.
            v = jnp.take(g_used.reshape(ru, nwin, k), widx_c, axis=1)
            kk = jnp.take(keys_w, widx_c, axis=0)
            return run(v.reshape(ru, -1), kk.reshape(-1))

        def full(_):
            return run(g_used, binned.pair_orig)

        per = jax.lax.cond(nlive_w <= w_cap, compact, full, None)

    outp = jnp.concatenate(
        [per[:nlive], per[2 * ru:2 * ru + 2]], axis=0
    )[:, :n]
    return outp.T


def _raster_bwd_pallas(cfg, residuals, cotangents):
    from dnsplatter_tpu.ops import rasterize_pallas as rp

    g_image, g_alpha = cotangents
    binned, payload, tfin_t, last_t, n = residuals
    f = g_image.shape[-1]  # feature count == composited channel count

    g_out_t = jnp.transpose(_image_to_tiles(cfg, g_image), (0, 2, 1))
    g_alpha_t = jnp.transpose(_image_to_tiles(cfg, g_alpha), (0, 2, 1))

    pack_grads = cfg.grad_reduce == "sortpack"
    grads, stage, nch = rp.backward_tiles(
        payload, binned.starts, binned.counts, g_out_t, g_alpha_t,
        tfin_t, last_t,
        cfg.n_tiles_padded, f, cfg.tile_size, cfg.tiles_x, cfg.chunk,
        pack_grads=pack_grads,
    )  # field-major per-pair grads + staged head windows + chunk counts
    del nch  # diagnostics only: unwritten slab columns are zeros (aliased)

    k = cfg.chunk
    nwin = grads.shape[1] // k
    w0 = binned.starts[:-1] // k  # (T_pad,) head-window index per tile
    use_bykey = (pack_grads and cfg.n_reduce_pieces == 1
                 and cfg.compact_frac > 0.0)
    if not use_bykey:
        # Dense CSR: merge each tile's staged head window into the slab
        # at window starts[t] // chunk. At any lane at most one
        # contributor is nonzero (owned lanes are disjoint; the slab
        # holds zeros under every staged lane), so a scatter-ADD is
        # exact — including on the bf16-packed int32 rows, where add
        # degenerates to select-nonzero.
        grads = (
            grads.reshape(grads.shape[0], nwin, k)
            .at[:, w0].add(jnp.moveaxis(stage, 0, 1))
            .reshape(grads.shape[0], nwin * k)
        )

    if use_bykey:
        out = _reduce_bykey(cfg, binned, grads, stage, last_t, f, n, w0)
    elif pack_grads:
        # Per-Gaussian reduction via variadic sort(s) keyed on each
        # pair's ORIGINAL gaussian id + the MXU reduce_segments kernels.
        # The backward kernel already emitted the 6 + F live gradient
        # rows bf16-packed two-per-int32 lane (in-kernel RNE), so the
        # sort carries ceil((6+F)/2) int32 rows instead of 16 f32 rows.
        # Keys are pair_orig (dummies carry the sentinel N and land past
        # starts[-1]); segment boundaries delimit each ORIGINAL
        # gaussian's contiguous range, so the reduced rows come out
        # directly in original parameter order. Culled pairs keep their
        # real id but exact-zero values, and unreplayed slots read zeros
        # too (the slab aliases a zero-filled buffer). |dmx|,|dmy|
        # (absgrad) are derived in the reduce kernel.
        #
        # KP > 1: the slab splits at pair-balanced TILE boundaries and
        # each piece sorts independently — the XLA sort is superlinear
        # in length (key+7: 9.5 ms at C/4 vs 43.8 ms at C = 5.24M,
        # perf/tpu_r4_probe3.py), so 4 quarter-sorts + one multi-range
        # reduce pass beat the monolithic sort by ~15 ms/frame at N=1M.
        # Exact: piece boundaries are tile boundaries, per-piece segment
        # starts are closed-form (bin_gaussians), and a piece that
        # overflows its static capacity falls back to the monolithic
        # path at runtime (lax.cond on piece_ok).
        nlive = 6 + f
        rows_used = (nlive + 1) // 2
        kp = cfg.n_reduce_pieces

        def reduce_mono(grads):
            sorted_out = jax.lax.sort(
                (binned.pair_orig,)
                + tuple(grads[i] for i in range(rows_used)),
                num_keys=1,
            )
            slab = jnp.stack(sorted_out[1:], axis=0)  # (PR, C_al) int32
            # reduce_segments streams `chunk`-wide lane slices; keep
            # reads past starts[-1] in bounds even at full capacity.
            slab = jnp.pad(slab, ((0, 0), (0, 512)))
            per = rp.reduce_segments_packed(slab, binned.orig_starts, n)
            return jnp.concatenate([per[:nlive], per[-2:]], axis=0)[:, :n]

        def reduce_pieces(grads):
            # Lane-ALIGNED piece extraction: a dynamic slice at an
            # arbitrary lane offset forces a cross-lane rotate of the
            # whole (rows, cp) slab on TPU (~3-4 ms/row — this is what
            # made the dynamic-piece path REGRESS end-to-end in
            # perf/tpu_r4_probe4/7.py despite the batched sort being
            # 11+ ms cheaper in isolation). Slicing whole chunk-windows
            # along a middle reshape axis moves no lanes; the piece's
            # real range [off_j, off_j + len_j) inside its
            # window-aligned slice is selected by masking the KEY row
            # to the sentinel — masked lanes sort past every real
            # segment and piece_starts totals exclude them, so the
            # grad rows need no masking at all.
            cp = cfg.piece_capacity
            k_ = cfg.chunk
            pj = binned.piece_bounds
            c_al = grads.shape[1]
            gwin = grads[:rows_used].reshape(rows_used, c_al // k_, k_)
            gwin = jnp.pad(gwin, ((0, 0), (0, cp // k_), (0, 0)))
            kpad = jnp.pad(binned.pair_orig[:c_al], (0, cp),
                           constant_values=n).reshape(-1, k_)
            lane = jnp.arange(cp, dtype=jnp.int32)
            keyp = []
            valp = []
            for j in range(kp):
                w0 = pj[j] // k_
                off = pj[j] - w0 * k_
                lenj = pj[j + 1] - pj[j]
                kj = jax.lax.dynamic_slice(
                    kpad, (w0, 0), (cp // k_, k_)
                ).reshape(cp)
                keyp.append(jnp.where(
                    (lane >= off) & (lane < off + lenj), kj, n
                ))
                valp.append(jax.lax.dynamic_slice(
                    gwin, (0, w0, 0), (rows_used, cp // k_, k_)
                ).reshape(rows_used, cp))
            # ONE batched (KP, cp) sort along the lane axis (the XLA
            # sort is superlinear in row length: key+7 mono 46.1 ms vs
            # 34.6 batched at KP=16, perf/tpu_r4_probe5.py).
            keys2 = jnp.stack(keyp, axis=0)  # (KP, cp)
            vals2 = jnp.stack(valp, axis=1)  # (rows, KP, cp)
            outs = jax.lax.sort(
                (keys2,) + tuple(vals2[i] for i in range(rows_used)),
                num_keys=1, dimension=-1,
            )
            packed = jnp.pad(jnp.stack(outs[1:], axis=1),
                             ((0, 0), (0, 0), (0, 512)))
            # The multi-reduce's chunk-visit count scales with
            # (N/blk) * KP — scale blk with the piece count (measured
            # 5.7-6.0 ms at kp=16 / blk>=1024 vs 13.1 mono, probe7).
            per = rp.reduce_segments_packed_multi(
                packed, binned.piece_starts, n,
                blk=256 if kp <= 4 else 2048,
            )
            return jnp.concatenate([per[:nlive], per[-2:]], axis=0)[:, :n]

        if kp > 1:
            outp = jax.lax.cond(binned.piece_ok, reduce_pieces,
                                reduce_mono, grads)
        else:
            outp = reduce_mono(grads)
        out = outp.T
    else:
        # Exact f32 path: one segment-sum keyed by the original gaussian
        # ids (dummies land in the dropped N bucket) — output is already
        # in original order. Measured note: f32 re-ordering of the
        # (GW, C_al) slab — gather, scatter, or an UNPACKED 16-row
        # sort — costs 21-50 ms at 2M pairs; the direct scatter-add is
        # the cheapest exact-f32 formulation.
        ps = jax.ops.segment_sum(
            grads.T, binned.pair_orig, num_segments=n + 1
        )[:n]  # (N, GW)
        out = jnp.concatenate(
            [ps[:, :6 + f], ps[:, rp.GW - 2:rp.GW]], axis=-1
        )  # (N, 8 + F)

    return (
        out[:, 0:2],
        out[:, 2:5],
        out[:, 5],
        out[:, 6:6 + f],
        out[:, 6 + f:8 + f],
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, 2), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )


_rasterize_core.defvjp(_raster_fwd, _raster_bwd)


def rasterize(
    means2d: jax.Array,
    conics: jax.Array,
    depths: jax.Array,
    opacities: jax.Array,
    features: jax.Array,
    valid: jax.Array,
    cfg: RasterizeConfig,
    absgrad_sink: jax.Array | None = None,
    radii: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Tile-rasterize screen-space Gaussians.

    Args:
        means2d: (N, 2) pixel centers. conics: (N, 3). depths: (N,) camera
        z (sort key). opacities: (N,) post-sigmoid. features: (N, F)
        channels to composite. valid: (N,) bool or {0,1} float.
        absgrad_sink: optional (N, 2) zeros; its gradient under jax.grad is
            the absolute screen-space gradient (densification statistic).
        radii: (N,) screen bounding radius; required for tile binning
            (defaults to 3-sigma radius derived from the conic).

    Returns:
        (image (H, W, F), alpha (H, W, 1)).
    """
    validf = valid.astype(jnp.float32)
    if radii is not None and radii.ndim == 1:
        radii = jnp.stack([radii, radii], -1)
    if radii is None:
        # conic = inv(cov2d): eigenvalues of cov2d from conic determinant.
        a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
        det_inv = jnp.maximum(a * c - b * b, 1e-12)
        ca = c / det_inv
        cc = a / det_inv
        mid = 0.5 * (ca + cc)
        disc = jnp.sqrt(jnp.maximum(mid * mid - (ca * cc - (b / det_inv) ** 2), 0.0))
        r = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
        radii = jnp.stack([r, r], -1)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros_like(means2d)
    return _rasterize_core(
        cfg, means2d, conics, opacities, features, absgrad_sink,
        depths, radii, validf,
    )
