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


def test_sharded_trainer_end_to_end_with_refinement(mesh8):
    """Trainer(devices=8): sharded train steps + a densify/cull event on
    the sharded state, loss tracking the single-device trainer."""
    from dnsplatter_tpu.data.synthetic import make_synthetic_scene
    from dnsplatter_tpu.models.dn_model import ModelConfig
    from dnsplatter_tpu.train.trainer import TrainConfig, Trainer

    scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=2,
                                 width=64, height=64,
                                 pair_capacity=1 << 13)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    mc = ModelConfig(
        use_depth_loss=True, depth_lambda=0.2, use_normal_loss=True,
        sh_degree=1, warmup_length=2, refine_every=8,
        densify_grad_thresh=1e-6, densify_size_thresh=1e-4,
    )

    def make(devices):
        return Trainer(
            data=scene, seed_points=(pts, cols), model_cfg=mc,
            train_cfg=TrainConfig(devices=devices, pair_capacity=1 << 13,
                                  chunk=32, tile_block=4, seed=5,
                                  steps_per_eval_image=0),
        )

    t1 = make(0)
    t8 = make(8)
    n0 = int(jnp.sum(t8.alive))  # seed count before any refinement
    h1 = t1.train(num_steps=20, log_every=20)
    h8 = t8.train(num_steps=20, log_every=20)
    assert t8.mesh is not None and t1.mesh is None
    assert len(t8.params.means.sharding.device_set) == 8
    l1, l8 = h1[-1]["loss"], h8[-1]["loss"]
    assert np.isfinite(l8)
    # identical math modulo f32 reduction order
    np.testing.assert_allclose(l8, l1, rtol=5e-2)
    # refinement fired ON THE SHARDED STATE: with densify_grad_thresh=1e-6
    # the densify event at step 16 must actually change the alive count,
    # and match the single-device trainer's count (same math).
    n1 = int(jnp.sum(t1.alive))
    n8 = int(jnp.sum(t8.alive))
    assert n8 != n0, "densify event did not change the sharded alive count"
    assert n8 == n1, f"sharded refinement diverged: {n8} vs single {n1}"
    assert np.isfinite(np.asarray(t8.params.means)).all()
