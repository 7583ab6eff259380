"""Pallas rasterizer backend vs the XLA path (interpret mode on CPU).

The XLA path is oracle-verified (test_rasterize.py); the Pallas kernels
must match it bit-for-bit-ish on both the forward images and every
gradient, including the absgrad sink.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.quat import random_quats
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize


def make_scene(key, n=300, width=64, height=48, f=4):
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.5, maxval=1.5)
    means = means.at[:, 2].set(means[:, 2] + 4.0)
    quats = random_quats(ks[1], n)
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-3.5, maxval=-1.2))
    opac = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.95)
    feats = jax.random.uniform(ks[4], (n, f))
    proj = project_gaussians(
        means, quats, scales, jnp.eye(4), 60.0, 60.0, width / 2, height / 2,
        width, height,
    )
    return proj, opac, feats


@pytest.mark.parametrize("wh", [(64, 48), (53, 37)])
def test_pallas_forward_matches_xla(wh):
    width, height = wh
    proj, opac, feats = make_scene(jax.random.PRNGKey(0), width=width,
                                   height=height)
    base = RasterizeConfig(width=width, height=height, tile_size=16,
                           chunk=32, tile_block=4, pair_capacity=1 << 14)
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = base._replace(backend=backend)
        outs[backend] = rasterize(
            proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid,
            cfg, radii=proj.radii,
        )
    np.testing.assert_allclose(np.asarray(outs["xla"][0]),
                               np.asarray(outs["pallas"][0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs["xla"][1]),
                               np.asarray(outs["pallas"][1]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("grad_reduce,rtol,atol", [
    ("segsum", 1e-4, 1e-5),     # exact f32 reduction: kernel-math parity
    ("sortpack", 2e-2, 2e-3),   # bf16-packed sort reduction: ~2^-9/pair
])
def test_pallas_backward_matches_xla(grad_reduce, rtol, atol):
    width, height = 48, 32
    proj, opac, feats = make_scene(jax.random.PRNGKey(1), n=250, width=width,
                                   height=height)
    base = RasterizeConfig(width=width, height=height, tile_size=16,
                           chunk=16, tile_block=2, pair_capacity=1 << 13,
                           grad_reduce=grad_reduce)
    w_img = jax.random.normal(jax.random.PRNGKey(7), (height, width, 4))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (height, width, 1))
    sink = jnp.zeros_like(proj.means2d)

    def loss(cfg, m, c, o, ft, s):
        img, a = rasterize(m, c, proj.depths, o, ft, proj.valid, cfg,
                           absgrad_sink=s, radii=proj.radii)
        return jnp.sum(img * w_img) + jnp.sum(a * w_a)

    grads = {}
    for backend in ("xla", "pallas"):
        cfg = base._replace(backend=backend)
        grads[backend] = jax.grad(
            lambda *a: loss(cfg, *a), argnums=(0, 1, 2, 3, 4)
        )(proj.means2d, proj.conics, opac, feats, sink)

    names = ["means2d", "conics", "opacities", "features", "absgrad"]
    for name, gx, gp in zip(names, grads["xla"], grads["pallas"]):
        gx, gp = np.asarray(gx), np.asarray(gp)
        scale = max(np.abs(gx).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gx / scale, rtol=rtol,
                                   atol=atol, err_msg=name)


@pytest.mark.parametrize("sort_scheme,reduce_pieces,compact_frac", [
    # THE shipping default composition (bench.py + Trainer at N=1M):
    # depthq key + streamed expand + sortpack + live-window compaction.
    ("depthq", 0, 0.625),
    # runtime fallback leg: a tiny static window budget forces the
    # lax.cond onto the uncompacted bykey path
    ("depthq", 0, 0.02),
    # bykey without window dropping (stage append + merge elimination)
    ("depthq", 0, 1.0),
    # legacy compositions kept honest: packed32 key + merge + boundary
    # reduce, monolithic and piecewise
    ("packed32", 0, 0.0),
    ("packed32", 4, 0.0),
])
def test_n1m_decision_path_composition_matches_xla(monkeypatch, sort_scheme,
                                                   reduce_pieces,
                                                   compact_frac):
    """Regression pin for the EXACT composition the N=1M bench config
    takes (bench.py N_GAUSS_1M): the shipping sort scheme + the STREAMED
    expand_segments (value table past VMEM residency) + sortpack
    gradient reduction (with live-window compaction) + the full
    7-feature payload (rgb+normal+depth), exercised end-to-end at toy
    sizes against the XLA backend. The individual pieces are
    layout-tested elsewhere (test_binning.py); this asserts their
    composition through the full custom-VJP path."""
    from dnsplatter_tpu.ops import rasterize_pallas as rp

    # Force the streamed expand at toy N (the 1M path crosses
    # resident_max naturally).
    orig_expand = rp.expand_segments

    def forced_stream(vals, starts, out_len, **kw):
        kw["resident_max"] = 128
        return orig_expand(vals, starts, out_len, **kw)

    monkeypatch.setattr(rp, "expand_segments", forced_stream)

    width, height = 64, 48
    proj, opac, _ = make_scene(jax.random.PRNGKey(5), n=350, width=width,
                               height=height, f=4)
    feats = jax.random.uniform(jax.random.PRNGKey(6), (350, 7))
    base = RasterizeConfig(width=width, height=height, tile_size=16,
                           chunk=32, tile_block=4, pair_capacity=1 << 14,
                           grad_reduce="sortpack", sort_scheme=sort_scheme,
                           reduce_pieces=reduce_pieces,
                           compact_frac=compact_frac)
    w_img = jax.random.normal(jax.random.PRNGKey(7), (height, width, 7))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (height, width, 1))
    sink = jnp.zeros_like(proj.means2d)

    def loss(cfg, m, c, o, ft, s):
        img, a = rasterize(m, c, proj.depths, o, ft, proj.valid, cfg,
                           absgrad_sink=s, radii=proj.radii)
        return jnp.sum(img * w_img) + jnp.sum(a * w_a)

    outs, grads = {}, {}
    for backend in ("xla", "pallas"):
        cfg = base._replace(backend=backend)
        outs[backend] = rasterize(
            proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid,
            cfg, radii=proj.radii,
        )
        grads[backend] = jax.grad(
            lambda *a: loss(cfg, *a), argnums=(0, 1, 2, 3, 4)
        )(proj.means2d, proj.conics, opac, feats, sink)

    # forward bit-close (identical compositing decisions)
    np.testing.assert_allclose(np.asarray(outs["xla"][0]),
                               np.asarray(outs["pallas"][0]),
                               rtol=1e-5, atol=1e-6)
    # grads within the sortpack bf16 tolerance
    names = ["means2d", "conics", "opacities", "features", "absgrad"]
    for name, gx, gp in zip(names, grads["xla"], grads["pallas"]):
        gx, gp = np.asarray(gx), np.asarray(gp)
        scale = max(np.abs(gx).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gx / scale, rtol=2e-2,
                                   atol=2e-3, err_msg=name)


def test_reduce_segments_bykey_unit():
    """Direct kernel test: key-equality segment reduce over a sorted
    bf16-packed slab matches a NumPy per-key sum, including the derived
    |field0|/|field1| absgrad rows, out-of-range keys (sentinel n,
    zero-value padding keyed 0) contributing nothing/zeros, and gaussians
    with no pairs reducing to zero."""
    from dnsplatter_tpu.ops import rasterize_pallas as rp
    from dnsplatter_tpu.ops.rasterize import _pack_bf16_2

    rng = np.random.default_rng(0)
    n = 300
    ru = 4  # 8 bf16 fields
    L = 2000
    keys = np.sort(rng.integers(0, n, L)).astype(np.int32)
    # gaussian 7 gets no pairs; some sentinel-n tails
    keys = keys[keys != 7]
    keys = np.concatenate([keys, np.full(40, n, np.int32)])
    L = len(keys)
    vals = rng.normal(size=(2 * ru, L)).astype(np.float32)
    vals[:, keys == n] = 1e9  # sentinel lanes must never be touched

    packed_rows = [
        _pack_bf16_2(jnp.asarray(vals[2 * i]), jnp.asarray(vals[2 * i + 1]))
        for i in range(ru)
    ]
    slab = jnp.stack(packed_rows + [jnp.asarray(keys)]
                     + [jnp.zeros((L,), jnp.int32)] * (8 - ru - 1), axis=0)
    slab = jnp.pad(slab, ((0, 0), (0, 512)))
    blk = 256
    n_pad = -(-n // blk) * blk
    qs = np.minimum(np.arange(n_pad // blk + 1) * blk, n).astype(np.int32)
    coarse = jnp.asarray(np.searchsorted(keys, qs, side="left"),
                         jnp.int32)
    out = np.asarray(rp.reduce_segments_bykey(slab, coarse, ru, n, blk=blk))
    assert out.shape == (2 * ru + 2, n_pad)

    # numpy reference on the bf16-rounded values
    v16 = np.asarray(
        jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32))
    expect = np.zeros((2 * ru + 2, n), np.float32)
    for g in range(n):
        m = keys == g
        expect[:2 * ru, g] = v16[:, m].sum(axis=1)
        expect[2 * ru, g] = np.abs(v16[0, m]).sum()
        expect[2 * ru + 1, g] = np.abs(v16[1, m]).sum()
    np.testing.assert_allclose(out[:, :n], expect, rtol=1e-5, atol=1e-5)
    assert np.all(out[:2 * ru, :n][:, 7] == 0.0)  # pairless gaussian


def test_compaction_drops_no_contributing_pair():
    """Live-window compaction must be a pure re-summation: the compact
    path (dead windows dropped, stage appended, key-equality reduce)
    and the legacy path (merge + boundary reduce) see the SAME bf16
    per-pair gradient values, so their per-Gaussian sums may differ
    only by f32 summation order (~ulps). A heavy-overdraw scene with
    an opaque near layer maximizes early termination — the config
    where most windows are dead and a dropped live window would show
    up as a large gradient error."""
    width, height = 64, 48
    n = 400
    proj, opac, feats = make_scene(jax.random.PRNGKey(9), n=n, width=width,
                                   height=height, f=4)
    opac = jnp.where(proj.depths < jnp.median(proj.depths), 0.98, opac)
    base = RasterizeConfig(width=width, height=height, tile_size=16,
                           chunk=32, tile_block=4, pair_capacity=1 << 14,
                           grad_reduce="sortpack", sort_scheme="depthq")
    w_img = jax.random.normal(jax.random.PRNGKey(7), (height, width, 4))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (height, width, 1))
    sink = jnp.zeros_like(proj.means2d)

    def grads_for(cfg):
        def loss(m, c, o, ft, s):
            img, a = rasterize(m, c, proj.depths, o, ft, proj.valid, cfg,
                               absgrad_sink=s, radii=proj.radii)
            return jnp.sum(img * w_img) + jnp.sum(a * w_a)
        return jax.grad(lambda *a: loss(*a), argnums=(0, 1, 2, 3, 4))(
            proj.means2d, proj.conics, opac, feats, sink)

    g_legacy = grads_for(base._replace(backend="pallas", compact_frac=0.0))
    g_compact = grads_for(base._replace(backend="pallas", compact_frac=0.625))
    for name, ga, gb in zip(["means2d", "conics", "opac", "feats", "abs"],
                            g_legacy, g_compact):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = max(np.abs(ga).max(), 1e-6)
        np.testing.assert_allclose(gb / scale, ga / scale, rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_depthq_scheme_matches_exact_and_cross_backend():
    """sort_scheme="depthq" (no depth pre-sort; tile + 20-bit quantized
    depth packed in the uint32 key; original-order payload table).
    On a scene with depth gaps far above the quantization step the
    layout must EQUAL the exact packed scheme's rendering, and the two
    backends must stay bit-close to each other under depthq."""
    width, height = 64, 48
    n = 300
    proj, opac, feats = make_scene(jax.random.PRNGKey(3), n=n, width=width,
                                   height=height, f=7)
    # well-separated depths (reassigned; projection geometry unchanged)
    depths = jnp.linspace(2.0, 8.0, n)[jax.random.permutation(
        jax.random.PRNGKey(4), n)]
    base = RasterizeConfig(width=width, height=height, tile_size=16,
                           chunk=32, tile_block=4, pair_capacity=1 << 14,
                           grad_reduce="sortpack")
    w_img = jax.random.normal(jax.random.PRNGKey(7), (height, width, 7))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (height, width, 1))

    def run(cfg):
        def loss(m, c, o, ft):
            img, a = rasterize(m, c, depths, o, ft, proj.valid, cfg,
                               radii=proj.radii)
            return jnp.sum(img * w_img) + jnp.sum(a * w_a), (img, a)
        (_, out), g = jax.value_and_grad(loss, has_aux=True, argnums=(0,))(
            proj.means2d, proj.conics, opac, feats)
        return out, g

    out_q, g_q = run(base._replace(sort_scheme="depthq", backend="pallas"))
    out_x, g_x = run(base._replace(sort_scheme="depthq", backend="xla"))
    out_e, g_e = run(base._replace(backend="pallas"))  # exact auto scheme

    # cross-backend parity under depthq
    np.testing.assert_allclose(np.asarray(out_q[0]), np.asarray(out_x[0]),
                               rtol=1e-5, atol=1e-6)
    # depthq == exact layout when no quantization ties exist
    np.testing.assert_allclose(np.asarray(out_q[0]), np.asarray(out_e[0]),
                               rtol=1e-5, atol=1e-6)
    for gq, ge in zip(g_q, g_e):
        gq, ge = np.asarray(gq), np.asarray(ge)
        scale = max(np.abs(ge).max(), 1e-6)
        np.testing.assert_allclose(gq / scale, ge / scale, rtol=2e-2,
                                   atol=2e-3)
