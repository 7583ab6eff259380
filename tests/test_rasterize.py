"""Production tiled rasterizer vs the dense oracle.

Forward images/alphas must match `rasterize_pixels_ref` exactly (same
compositing semantics), and the hand-derived custom VJP must match
`jax.grad` through the oracle on every input (means2d, conics, opacities,
features). This is the test strategy of SURVEY.md section 7 step 3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.quat import random_quats
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize
from dnsplatter_tpu.ops.rasterize_ref import rasterize_pixels_ref


def make_scene(key, n=400, width=64, height=48, f=5):
    """Random projected scene with a real camera projection (so conics and
    radii are physically consistent)."""
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.5, maxval=1.5)
    means = means.at[:, 2].set(means[:, 2] + 4.0)
    quats = random_quats(ks[1], n)
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-3.5, maxval=-1.2))
    opac = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=0.95)
    feats = jax.random.uniform(ks[4], (n, f))
    viewmat = jnp.eye(4)
    fx = fy = 60.0
    cx, cy = width / 2.0, height / 2.0
    proj = project_gaussians(
        means, quats, scales, viewmat, fx, fy, cx, cy, width, height
    )
    return proj, opac, feats


@pytest.mark.parametrize("capacity", [1 << 14, 1 << 16])
def test_forward_matches_oracle(capacity):
    key = jax.random.PRNGKey(0)
    width, height = 64, 48
    proj, opac, feats = make_scene(key, width=width, height=height)
    cfg = RasterizeConfig(
        width=width, height=height, tile_size=16, chunk=32, tile_block=4,
        pair_capacity=capacity,
    )
    img, alpha = rasterize(
        proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid, cfg,
        radii=proj.radii,
    )
    img_ref, alpha_ref = rasterize_pixels_ref(
        proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid,
        width, height, radii=proj.radii, tile_size=16,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-4, atol=1e-5)


def test_forward_odd_image_size():
    """Width/height not multiples of the tile size."""
    key = jax.random.PRNGKey(3)
    width, height = 53, 37
    proj, opac, feats = make_scene(key, n=200, width=width, height=height, f=3)
    cfg = RasterizeConfig(width=width, height=height, tile_size=16,
                          chunk=16, tile_block=3, pair_capacity=1 << 14)
    img, alpha = rasterize(
        proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid, cfg,
        radii=proj.radii,
    )
    img_ref, alpha_ref = rasterize_pixels_ref(
        proj.means2d, proj.conics, proj.depths, opac, feats, proj.valid,
        width, height, radii=proj.radii, tile_size=16,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-4, atol=1e-5)


def test_backward_matches_oracle():
    key = jax.random.PRNGKey(1)
    width, height = 48, 32
    proj, opac, feats = make_scene(key, n=250, width=width, height=height, f=4)
    cfg = RasterizeConfig(width=width, height=height, tile_size=16,
                          chunk=16, tile_block=2, pair_capacity=1 << 14)

    kimg, kalpha = jax.random.split(jax.random.PRNGKey(7))
    w_img = jax.random.normal(kimg, (height, width, 4))
    w_alpha = jax.random.normal(kalpha, (height, width, 1))

    def loss_prod(means2d, conics, opacities, features):
        img, alpha = rasterize(
            means2d, conics, proj.depths, opacities, features, proj.valid,
            cfg, radii=proj.radii,
        )
        return jnp.sum(img * w_img) + jnp.sum(alpha * w_alpha)

    def loss_ref(means2d, conics, opacities, features):
        img, alpha = rasterize_pixels_ref(
            means2d, conics, proj.depths, opacities, features, proj.valid,
            width, height, radii=proj.radii, tile_size=16,
        )
        return jnp.sum(img * w_img) + jnp.sum(alpha * w_alpha)

    args = (proj.means2d, proj.conics, opac, feats)
    g_prod = jax.grad(loss_prod, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    names = ["means2d", "conics", "opacities", "features"]
    for name, gp, gr in zip(names, g_prod, g_ref):
        gp, gr = np.asarray(gp), np.asarray(gr)
        scale = np.maximum(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(
            gp / scale, gr / scale, rtol=2e-3, atol=2e-4,
            err_msg=f"gradient mismatch for {name}",
        )


def test_absgrad_sink():
    """absgrad >= |grad| elementwise, same shape, nonzero where grad is."""
    key = jax.random.PRNGKey(2)
    width, height = 32, 32
    proj, opac, feats = make_scene(key, n=150, width=width, height=height, f=3)
    cfg = RasterizeConfig(width=width, height=height, tile_size=16,
                          chunk=16, tile_block=2, pair_capacity=1 << 13)
    sink = jnp.zeros_like(proj.means2d)

    def loss(means2d, sink):
        img, alpha = rasterize(
            means2d, proj.conics, proj.depths, opac, feats, proj.valid, cfg,
            absgrad_sink=sink, radii=proj.radii,
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    g_mean, g_abs = jax.grad(loss, argnums=(0, 1))(proj.means2d, sink)
    g_mean, g_abs = np.asarray(g_mean), np.asarray(g_abs)
    assert g_abs.shape == g_mean.shape
    assert (g_abs >= np.abs(g_mean) - 1e-5).all()
    assert g_abs.sum() > 0


def test_empty_scene():
    cfg = RasterizeConfig(width=32, height=32, tile_size=16, chunk=16,
                          tile_block=2, pair_capacity=1 << 10)
    n = 8
    img, alpha = rasterize(
        jnp.zeros((n, 2)), jnp.tile(jnp.array([[1.0, 0.0, 1.0]]), (n, 1)),
        jnp.ones((n,)), jnp.ones((n,)) * 0.5, jnp.ones((n, 3)),
        jnp.zeros((n,), bool), cfg, radii=jnp.zeros((n,)),
    )
    assert np.asarray(img).sum() == 0
    assert np.asarray(alpha).sum() == 0


def test_capacity_overflow_degrades_gracefully():
    """With a tiny pair capacity the deepest Gaussians drop but the render
    still runs and front content is preserved."""
    key = jax.random.PRNGKey(5)
    width = height = 32
    proj, opac, feats = make_scene(key, n=300, width=width, height=height, f=3)
    big = RasterizeConfig(width=width, height=height, tile_size=16, chunk=16,
                          tile_block=2, pair_capacity=1 << 14)
    tiny = big._replace(pair_capacity=64)
    img_big, _ = rasterize(proj.means2d, proj.conics, proj.depths, opac,
                           feats, proj.valid, big, radii=proj.radii)
    img_tiny, _ = rasterize(proj.means2d, proj.conics, proj.depths, opac,
                            feats, proj.valid, tiny, radii=proj.radii)
    assert np.isfinite(np.asarray(img_tiny)).all()
    assert np.asarray(img_big).shape == np.asarray(img_tiny).shape
