"""Direct invariants of the single-sort aligned binning + reduction."""

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.rasterize import RasterizeConfig, bin_gaussians
from dnsplatter_tpu.ops.rasterize_pallas import reduce_segments


def _scene(n=300, w=128, h=96, seed=0, aniso=False):
    rng = np.random.default_rng(seed)
    m2d = rng.uniform(-10, [w + 10, h + 10], (n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, n).astype(np.float32)
    if aniso:
        radii = rng.uniform(1, 25, (n, 2)).astype(np.float32)
    else:
        radii = rng.uniform(1, 25, n).astype(np.float32)
    valid = (rng.uniform(size=n) > 0.1).astype(np.float32)
    return m2d, depths, radii, valid


def _brute_pairs(cfg, m2d, depths, radii, valid):
    """(tile, gauss-depth-rank) pair set + per-gaussian pair counts in
    depth-sorted order, straight from the definitions."""
    n = len(m2d)
    order = np.argsort(np.where(valid > 0.5, depths, np.inf),
                       kind="stable")
    rad = radii if radii.ndim == 2 else np.stack([radii, radii], -1)
    pairs = set()
    counts = np.zeros(n, np.int64)
    for rank, gi in enumerate(order):
        if valid[gi] <= 0.5:
            continue
        x0 = int(np.clip(np.floor((m2d[gi, 0] - rad[gi, 0]) / 16), 0,
                         cfg.tiles_x))
        x1 = int(np.clip(np.floor((m2d[gi, 0] + rad[gi, 0]) / 16) + 1, 0,
                         cfg.tiles_x))
        y0 = int(np.clip(np.floor((m2d[gi, 1] - rad[gi, 1]) / 16), 0,
                         cfg.tiles_y))
        y1 = int(np.clip(np.floor((m2d[gi, 1] + rad[gi, 1]) / 16) + 1, 0,
                         cfg.tiles_y))
        counts[rank] = max(x1 - x0, 0) * max(y1 - y0, 0)
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                pairs.add((ty * cfg.tiles_x + tx, rank))
    return pairs, counts


def _check_layout(cfg, b, pairs, n):
    starts = np.asarray(b.starts)
    counts = np.asarray(b.counts)
    pg = np.asarray(b.pair_gauss)
    # dense CSR: gap-free ranges + a sentinel chunk tail for kernel DMAs
    assert starts[0] == 0
    np.testing.assert_array_equal(np.diff(starts), counts)
    assert len(pg) == cfg.pair_buffer == cfg.pair_capacity + cfg.chunk
    got = set()
    for t in range(cfg.n_tiles_padded):
        seg = pg[starts[t]: starts[t + 1]]
        assert (seg < n).all(), "dead slot inside real range"
        assert (np.diff(seg) > 0).all(), "within-tile depth order broken"
        got |= {(t, int(g)) for g in seg}
    assert (pg[starts[-1]:] == n).all(), "real pair past starts[-1]"
    assert got == pairs


def test_layout_matches_bruteforce_scalar_and_aniso():
    for aniso, seed in [(False, 0), (True, 1), (True, 2)]:
        m2d, depths, radii, valid = _scene(seed=seed, aniso=aniso)
        cfg = RasterizeConfig(width=128, height=96, tile_size=16, chunk=16,
                              tile_block=4, pair_capacity=1 << 13)
        b = bin_gaussians(cfg, jnp.asarray(m2d), jnp.asarray(depths),
                          jnp.asarray(radii), jnp.asarray(valid))
        pairs, counts = _brute_pairs(cfg, m2d, depths, radii, valid)
        assert int(b.total_pairs) == len(pairs)
        _check_layout(cfg, b, pairs, len(m2d))
        # per-gaussian grouped ranges (spatial walk order)
        gs = np.asarray(b.gauss_starts)
        sp = np.asarray(b.spatial_perm)
        np.testing.assert_array_equal(np.diff(gs), counts[sp])


def test_overflow_drops_whole_deepest_gaussians():
    m2d, depths, radii, valid = _scene(n=400, seed=3)
    cfg = RasterizeConfig(width=128, height=96, tile_size=16, chunk=16,
                          tile_block=4, pair_capacity=256)  # tiny
    b = bin_gaussians(cfg, jnp.asarray(m2d), jnp.asarray(depths),
                      jnp.asarray(radii), jnp.asarray(valid))
    pairs_all, counts = _brute_pairs(cfg, m2d, depths, radii, valid)
    assert int(b.total_pairs) == len(pairs_all)  # raw diagnostic
    # kept = the shallowest prefix of gaussians whose ranges fit
    kept_pairs = set()
    acc = 0
    for rank, cnt in enumerate(counts):
        if acc + cnt > 256:
            break
        acc += cnt
        kept_pairs |= {p for p in pairs_all if p[1] == rank}
    _check_layout(cfg, b, kept_pairs, len(m2d))
    # orig_starts stays consistent under the overflow drop (the slow
    # permute path): segment sizes == live pair_orig id counts
    po = np.asarray(b.pair_orig)
    pg = np.asarray(b.pair_gauss)
    os_ = np.asarray(b.orig_starts)
    np.testing.assert_array_equal(
        np.diff(os_), np.bincount(po[pg < len(m2d)], minlength=len(m2d))
    )


def test_pair_orig_ids_and_segments():
    m2d, depths, radii, valid = _scene(seed=4)
    cfg = RasterizeConfig(width=128, height=96, tile_size=16, chunk=16,
                          tile_block=4, pair_capacity=1 << 13)
    b = bin_gaussians(cfg, jnp.asarray(m2d), jnp.asarray(depths),
                      jnp.asarray(radii), jnp.asarray(valid))
    po = np.asarray(b.pair_orig)
    pg = np.asarray(b.pair_gauss)
    order = np.asarray(b.order)
    n = len(m2d)
    total = int(np.asarray(b.gauss_starts)[-1])
    live = pg < n
    # live slots carry the ORIGINAL gaussian id of their pair
    np.testing.assert_array_equal(po[live], order[pg[live]])
    assert (po[~live] == n).all()
    # orig_starts delimits per-ORIGINAL-gaussian segments: the multiset
    # of live ids grouped by id matches the segment sizes, and the
    # segments tile [0, total)
    os_ = np.asarray(b.orig_starts)
    assert os_[0] == 0 and os_[-1] == total
    seg_sizes = np.diff(os_)
    id_counts = np.bincount(po[live], minlength=n)
    np.testing.assert_array_equal(seg_sizes, id_counts)
    # sorting the live slab by pair_orig reproduces exactly those
    # segments (what the gradient-reduction sort relies on)
    keys = np.sort(po)  # includes dead sentinels at the tail
    for g in range(n):
        seg = keys[os_[g]:os_[g + 1]]
        assert (seg == g).all()


def test_reduce_segments_matches_numpy():
    rng = np.random.default_rng(5)
    n = 300
    counts = rng.integers(0, 9, n)
    total = counts.sum()
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    c = int(total) + 700  # slack past starts[-1] (kernel overrun room)
    grads = rng.normal(size=(16, c)).astype(np.float32)
    out = np.asarray(reduce_segments(
        jnp.asarray(grads), jnp.asarray(starts), n, chunk=128, blk=32
    ))[:, :n]
    expect = np.zeros((16, n), np.float32)
    for g in range(n):
        expect[:, g] = grads[:, starts[g]:starts[g + 1]].sum(1)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_reduce_segments_packed_matches_f32():
    """Packed-bf16 variant: in-kernel decode (bits << 16) + abs rows must
    match packing+unpacking through the f32 kernel exactly."""
    from dnsplatter_tpu.ops.rasterize import _pack_bf16_2, _unpack_bf16_2
    from dnsplatter_tpu.ops.rasterize_pallas import reduce_segments_packed

    rng = np.random.default_rng(7)
    n = 200
    counts = rng.integers(0, 9, n)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    c = int(counts.sum()) + 700
    fields = rng.normal(size=(14, c)).astype(np.float32) * 3.0
    packed = jnp.stack(
        [_pack_bf16_2(jnp.asarray(fields[2 * i]), jnp.asarray(fields[2 * i + 1]))
         for i in range(7)], axis=0)
    # roundtrip: unpack reproduces the bf16-rounded fields bit-exactly
    a0, b0 = _unpack_bf16_2(packed[0])
    np.testing.assert_array_equal(
        np.asarray(a0), fields[0].astype(jnp.bfloat16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(b0), fields[1].astype(jnp.bfloat16).astype(np.float32))

    out = np.asarray(reduce_segments_packed(
        packed, jnp.asarray(starts), n, chunk=128, blk=32))[:, :n]
    assert out.shape[0] == 16  # 14 fields + 2 abs rows
    fb = fields.astype(jnp.bfloat16).astype(np.float32)
    expect = np.zeros((16, n), np.float32)
    for g in range(n):
        seg = fb[:, starts[g]:starts[g + 1]]
        expect[:14, g] = seg.sum(1)
        expect[14, g] = np.abs(seg[0]).sum()
        expect[15, g] = np.abs(seg[1]).sum()
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_rne_bf16_bits_matches_astype():
    """The in-kernel integer RNE (bits + 0x7FFF + lsb) must equal XLA's
    f32->bf16 convert bit-for-bit on finite values, including negatives,
    denormals, halfway ties, and huge magnitudes."""
    from dnsplatter_tpu.ops.rasterize_pallas import _rne_bf16_bits

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(size=1000).astype(np.float32) * 10.0 ** rng.integers(
            -30, 30, 1000),
        np.array([0.0, -0.0, 1.0, -1.0, 1e-40, -1e-40, 3.3895e38,
                  -3.3895e38], np.float32),
        # exact ties: f32 values exactly halfway between two bf16s
        np.frombuffer(
            (np.arange(32, dtype=np.uint32) * 0x10000 + 0x3f808000
             ).astype(np.uint32).tobytes(), dtype=np.float32),
    ])
    got = np.asarray(_rne_bf16_bits(jnp.asarray(vals))).astype(np.int32)
    expect = np.frombuffer(
        np.asarray(jnp.asarray(vals).astype(jnp.bfloat16)).tobytes(),
        dtype=np.uint16,
    ).astype(np.int32)
    np.testing.assert_array_equal(got & 0xFFFF, expect)


def test_expand_segments_matches_numpy():
    from dnsplatter_tpu.ops.rasterize_pallas import expand_segments

    rng = np.random.default_rng(13)
    n = 500
    counts = rng.integers(0, 7, n)
    counts[rng.integers(0, n, 50)] = 0  # empty-segment runs
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    total = int(starts[-1])
    out_len = total + 300  # tail past starts[-1] must be zeros
    vals = rng.integers(-(1 << 20), 1 << 20, (4, n)).astype(np.int32)
    out = np.asarray(expand_segments(
        jnp.asarray(vals), jnp.asarray(starts), out_len, chunk=256, win=32))
    expect = np.zeros((4, out_len), np.int32)
    for g in range(n):
        expect[:, starts[g]:starts[g + 1]] = vals[:, g:g + 1]
    np.testing.assert_array_equal(out, expect)


def test_exact_cull_drops_only_invisible_pairs():
    """Culled (gaussian, tile) pairs must have max alpha < 1/255 over the
    tile's pixel centers (semantics-exact cull); counts shrink, ranges
    keep the culled slots as sentinel-gauss tail entries."""
    rng = np.random.default_rng(21)
    n, w, h = 200, 128, 96
    m2d = rng.uniform(0, [w, h], (n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, n).astype(np.float32)
    # anisotropic conics (PD): random rotation of diag(1/sx^2, 1/sy^2)
    sx = rng.uniform(1.0, 12.0, n)
    sy = rng.uniform(1.0, 12.0, n)
    th = rng.uniform(0, np.pi, n)
    ct, st = np.cos(th), np.sin(th)
    a = (ct**2 / sx**2 + st**2 / sy**2).astype(np.float32)
    b = (ct * st * (1 / sx**2 - 1 / sy**2)).astype(np.float32)
    cc = (st**2 / sx**2 + ct**2 / sy**2).astype(np.float32)
    conics = np.stack([a, b, cc], -1)
    opac = rng.uniform(0.02, 1.0, n).astype(np.float32)
    # generous radii so rects overcover (cull has work to do)
    radii = np.full(n, 40.0, np.float32)
    valid = np.ones(n, np.float32)

    cfg = RasterizeConfig(width=w, height=h, tile_size=16, chunk=16,
                          tile_block=4, pair_capacity=1 << 14,
                          backend="pallas", exact_cull=True)
    b_cull = bin_gaussians(cfg, jnp.asarray(m2d), jnp.asarray(depths),
                           jnp.asarray(radii), jnp.asarray(valid),
                           conics=jnp.asarray(conics),
                           opacities=jnp.asarray(opac))
    b_all = bin_gaussians(cfg, jnp.asarray(m2d), jnp.asarray(depths),
                          jnp.asarray(radii), jnp.asarray(valid))
    starts = np.asarray(b_cull.starts)
    np.testing.assert_array_equal(starts, np.asarray(b_all.starts))
    cnt_c = np.asarray(b_cull.counts)
    cnt_a = np.asarray(b_all.counts)
    assert (cnt_c <= cnt_a).all()
    assert cnt_c.sum() < cnt_a.sum(), "cull removed nothing"
    order = np.asarray(b_cull.order)
    pg_c = np.asarray(b_cull.pair_gauss)
    pg_a = np.asarray(b_all.pair_gauss)
    for t in range(cfg.n_tiles):
        live_c = set(pg_c[starts[t]:starts[t] + cnt_c[t]].tolist())
        live_a = set(pg_a[starts[t]:starts[t] + cnt_a[t]].tolist())
        assert live_c <= live_a
        # culled slots are sentinel-tail entries of the same range
        tail = pg_c[starts[t] + cnt_c[t]:starts[t + 1]]
        assert (tail == n).all()
        ty, tx = divmod(t, cfg.tiles_x)
        px = tx * 16 + np.arange(16) + 0.5
        py = ty * 16 + np.arange(16) + 0.5
        PX, PY = np.meshgrid(px, py)
        for rank in live_a - live_c:
            gi = order[rank]
            dx = PX - m2d[gi, 0]
            dy = PY - m2d[gi, 1]
            sig = 0.5 * (a[gi] * dx**2 + cc[gi] * dy**2) + b[gi] * dx * dy
            amax = opac[gi] * np.exp(-sig).max()
            assert amax < 1.0 / 255.0, (
                f"tile {t} gauss {gi}: culled pair visible (alpha {amax})")


def test_tilekey_sort_layout_identical_to_packed():
    """The large-N stable tile-key sort must reproduce the packed-key
    layout bit-for-bit (the packed key overflows int32 past N ~ 931k at
    the bench tiling; reference-default workloads are 500k-1M,
    mushroom_dataparser.py:97-98 / dn_model.py:135)."""
    from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
    from dnsplatter_tpu.ops.projection import project_gaussians

    n, w, h = 3000, 256, 160
    params, alive = make_gt_gaussians(jax.random.PRNGKey(3), n, extent=1.5)
    cam = ring_cameras(1, width=w, img_height=h, focal=200.0)[0]
    opac = jax.nn.sigmoid(params.opacities)
    proj = project_gaussians(
        params.means, params.quats, jnp.exp(params.scales), cam.viewmat(),
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy), w, h,
        opacities=opac,
    )
    validf = (proj.valid & (alive > 0.5)).astype(jnp.float32)
    for backend in ("xla", "pallas"):
        for cull in (False, True):
            outs = [
                bin_gaussians(
                    RasterizeConfig(width=w, height=h, tile_size=16,
                                    chunk=128, pair_capacity=1 << 16,
                                    backend=backend, exact_cull=cull,
                                    sort_scheme=s),
                    proj.means2d, proj.depths, proj.radii_xy, validf,
                    conics=proj.conics, opacities=opac,
                )
                for s in ("packed", "packed32", "tilekey")
            ]
            for field in ("order", "pair_gauss", "pair_orig", "starts",
                          "counts", "gauss_starts", "orig_starts"):
                for alt in (1, 2):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(outs[0], field)),
                        np.asarray(getattr(outs[alt], field)),
                        err_msg=f"{backend} cull={cull} field={field} "
                                f"scheme_idx={alt}",
                    )


def test_expand_segments_streaming_matches_resident():
    """The large-N streaming expand (value table streamed from HBM, only
    boundaries resident) is bit-identical to the VMEM-resident kernel."""
    from dnsplatter_tpu.ops.rasterize_pallas import expand_segments

    rng = np.random.default_rng(7)
    n, out_len = 3000, 17000
    counts = rng.integers(0, 11, n)
    counts[rng.uniform(size=n) < 0.3] = 0  # empty segments interleaved
    starts = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    )
    vals_i = jnp.asarray(
        rng.integers(-(1 << 20), 1 << 20, (5, n)).astype(np.int32)
    )
    vals_f = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    a = expand_segments(vals_i, starts, out_len)
    b = expand_segments(vals_i, starts, out_len, resident_max=256)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    af = expand_segments(vals_f, starts, out_len, out_dtype=jnp.float32)
    bf = expand_segments(vals_f, starts, out_len, out_dtype=jnp.float32,
                         resident_max=256)
    np.testing.assert_array_equal(np.asarray(af), np.asarray(bf))
