"""Baseline NeRF models: fields, rendering, and short training runs."""

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.baselines import fields as F
from dnsplatter_tpu.baselines import nerfacto, neusfacto
from dnsplatter_tpu.data.synthetic import make_synthetic_scene


def test_hash_encode_shapes_and_grads():
    cfg = F.HashGridConfig(n_levels=4, log2_table_size=10, max_res=64)
    tables = F.init_hash_grid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    out = F.hash_encode(tables, x, cfg)
    assert out.shape == (128, 4 * cfg.features_per_level)

    g = jax.grad(lambda t: jnp.sum(F.hash_encode(t, x, cfg) ** 2))(tables)
    assert float(jnp.abs(g).sum()) > 0


def test_nerfacto_learns_a_frame():
    scene = make_synthetic_scene(seed=0, n_gaussians=150, n_cameras=1,
                                 width=48, height=36,
                                 pair_capacity=1 << 12)
    cam, batch = scene.get(0)
    cfg = nerfacto.NerfactoConfig(
        n_coarse=24, n_fine=24, far=8.0,
        hash=F.HashGridConfig(n_levels=6, log2_table_size=12, max_res=128),
        use_depth_loss=True,
    )
    params = nerfacto.init_params(jax.random.PRNGKey(0), cfg)
    step, opt = nerfacto.make_train_step(cfg, lr=5e-3)
    import optax

    opt_state = opt.init(params)
    img = jnp.asarray(batch["image"])
    dep = jnp.asarray(batch["sensor_depth"])
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(40):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, cam, img, dep, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses[:3] + losses[-3:]


def test_neusfacto_runs():
    scene = make_synthetic_scene(seed=0, n_gaussians=100, n_cameras=1,
                                 width=32, height=24,
                                 pair_capacity=1 << 11)
    cam, batch = scene.get(0)
    cfg = neusfacto.NeuSConfig(
        n_samples=32, far=6.0,
        hash=F.HashGridConfig(n_levels=4, log2_table_size=10, max_res=64),
    )
    params = neusfacto.init_params(jax.random.PRNGKey(0), cfg)
    step, opt = neusfacto.make_train_step(cfg, lr=3e-3)
    import optax

    opt_state = opt.init(params)
    img = jnp.asarray(batch["image"])
    dep = jnp.asarray(batch["sensor_depth"])
    nrm = jnp.asarray(batch["normal"])
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(10):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, cam, img, dep,
                                       nrm, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
