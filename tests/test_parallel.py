"""Multi-chip sharding: tile-sharded render parity + sharded train step.

Runs on the forced 8-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.parallel.sharding import make_mesh, shard_gaussian_state
from dnsplatter_tpu.parallel.tile_sharding import tile_sharded_render


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(jax.devices()[:8])


def test_tile_sharded_render_matches_single(mesh8):
    from dnsplatter_tpu.ops.render import render

    n = 512  # divisible by 8
    params, alive = make_gt_gaussians(jax.random.PRNGKey(0), n)
    cam = ring_cameras(1, width=64, img_height=64)[0]
    cfg = RasterizeConfig(width=64, height=64, tile_size=16, chunk=32,
                          tile_block=2, pair_capacity=1 << 14)

    out_single, _ = render(params, alive, cam, cfg, sh_degree_to_use=1,
                           background=jnp.zeros((3,)))

    gs_params = jax.tree.map(
        lambda t: jax.device_put(
            t, jax.sharding.NamedSharding(
                mesh8, jax.sharding.PartitionSpec("gauss")
            )
        ) if getattr(t, "ndim", 0) >= 1 else t,
        params,
    )
    gs_alive = jax.device_put(
        alive,
        jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("gauss")),
    )
    img, alpha = tile_sharded_render(gs_params, gs_alive, cam, cfg, mesh8,
                                     sh_degree=1)
    # channels: rgb(3) + normal(3) + depth(1); single-chip render returns
    # processed outputs — compare raw composites via the rgb channels
    rgb_sharded = np.asarray(img[..., :3]) + (
        1 - np.asarray(alpha)
    ) * 0.0  # zero background
    rgb_single_acc = np.asarray(out_single.rgb)  # bg-composited w/ zeros
    np.testing.assert_allclose(rgb_sharded, rgb_single_acc, rtol=1e-4,
                               atol=1e-5)


def test_tile_sharded_gradients(mesh8):
    n = 256
    params, alive = make_gt_gaussians(jax.random.PRNGKey(1), n)
    cam = ring_cameras(1, width=32, img_height=32)[0]
    cfg = RasterizeConfig(width=32, height=32, tile_size=16, chunk=16,
                          tile_block=2, pair_capacity=1 << 12)
    gs = jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("gauss"))
    params_s = jax.tree.map(
        lambda t: jax.device_put(t, gs) if getattr(t, "ndim", 0) >= 1 else t,
        params,
    )
    alive_s = jax.device_put(alive, gs)

    def loss(p):
        img, alpha = tile_sharded_render(p, alive_s, cam, cfg, mesh8,
                                         sh_degree=0)
        return jnp.sum(img**2) + jnp.sum(alpha)

    g = jax.grad(loss)(params_s)
    gm = np.asarray(g.means)
    assert np.isfinite(gm).all()
    assert np.abs(gm).sum() > 0
