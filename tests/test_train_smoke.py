"""End-to-end training smoke tests on a synthetic scene (CPU mesh).

Covers SURVEY.md section 7 step 4's 'minimum end-to-end slice': a tiny
Gaussian-mixture scene trained with the full DN-Splatter loss stack
(rgb + depth + normal + scale), checking the loss decreases and the state
machinery (Adam, refinement transforms, checkpointing) round-trips.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.data.synthetic import make_synthetic_scene
from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.train.optim import OptimConfig
from dnsplatter_tpu.train.trainer import TrainConfig, Trainer


def _make_trainer(tmp_path=None, **model_kw):
    scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=4,
                                 width=64, height=48,
                                 pair_capacity=1 << 14)
    model_cfg = ModelConfig(
        use_depth_loss=True,
        depth_lambda=0.2,
        use_normal_loss=True,
        normal_lambda=0.1,
        warmup_length=10_000,  # keep refinement out of the smoke loop
        sh_degree=1,
        num_downscales=0,
        **model_kw,
    )
    key = jax.random.PRNGKey(1)
    pts, cols = scene.seed_points(key, noise=0.03)
    trainer = Trainer(
        data=scene,
        seed_points=(pts, cols),
        model_cfg=model_cfg,
        train_cfg=TrainConfig(pair_capacity=1 << 14, chunk=32, tile_block=4,
                              seed=3),
    )
    return scene, trainer


def test_loss_decreases():
    scene, trainer = _make_trainer()
    hist = trainer.train(num_steps=30, log_every=10)
    losses = [h["loss"] for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses}"


def test_ags_mesh_strategy_runs():
    scene, trainer = _make_trainer(regularization_strategy="ags-mesh")
    hist = trainer.train(num_steps=6, log_every=3)
    assert np.isfinite([h["loss"] for h in hist]).all()


def test_checkpoint_roundtrip(tmp_path):
    scene, trainer = _make_trainer()
    trainer.out_dir = tmp_path
    trainer.train(num_steps=4, log_every=2)
    p = trainer.save_checkpoint()
    step0, means0 = trainer.step, np.asarray(trainer.params.means)

    scene2, trainer2 = _make_trainer()
    trainer2.load_checkpoint(p)
    assert trainer2.step == step0
    np.testing.assert_array_equal(np.asarray(trainer2.params.means), means0)


def test_resume_continues_training(tmp_path):
    """CLI --resume semantics: load a checkpoint mid-run and continue
    training to the remaining step budget with intact optimizer state."""
    scene, trainer = _make_trainer()
    trainer.out_dir = tmp_path
    trainer.train(num_steps=6, log_every=3)
    p = trainer.save_checkpoint()
    mu0 = np.asarray(trainer.adam.mu.means)

    scene2, trainer2 = _make_trainer()
    trainer2.out_dir = tmp_path
    trainer2.load_checkpoint(p)
    # Adam moments restored (not reinitialized) and step fns rebuilt
    np.testing.assert_array_equal(np.asarray(trainer2.adam.mu.means), mu0)
    assert not trainer2._step_fns
    target_total = 10
    hist = trainer2.train(num_steps=target_total - trainer2.step,
                          log_every=2)
    assert trainer2.step == target_total
    assert np.isfinite([h["loss"] for h in hist]).all()


def test_refinement_transforms():
    """densify/cull/reset transforms keep shapes static and masks sane."""
    from dnsplatter_tpu.train.strategy import (
        RefineStats, cull_only, densify_and_cull, reset_opacity,
    )
    from dnsplatter_tpu.train.optim import init_adam
    from dnsplatter_tpu.models.gaussians import init_from_points

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    params, alive, _ = init_from_points(jax.random.PRNGKey(0), pts, cols,
                                        capacity=256)
    adam = init_adam(params)
    cfg = ModelConfig()
    c = params.capacity

    # Force interesting stats: huge grads on the first 32, big sizes on 16.
    stats = RefineStats(
        grad_sum=jnp.where(jnp.arange(c) < 32, 100.0, 0.0),
        vis_count=jnp.ones((c,)),
        max_2d=jnp.zeros((c,)),
    )
    big = jnp.where(jnp.arange(c) < 16, jnp.log(0.05), params.scales[:, 0])
    params = dataclasses.replace(
        params, scales=jnp.stack([big] * 3, -1)
    )

    n0 = int(jnp.sum(alive))
    p2, a2, ad2, st2 = densify_and_cull(
        cfg, params, alive, adam, stats, jax.random.PRNGKey(1),
        step=3000, max_size=64.0,
    )
    assert p2.means.shape == params.means.shape  # static!
    n2 = int(jnp.sum(a2))
    # 16 split (die, 2 kids each) + 16 dups: 64 - 16 + 32 + 16 = 96
    assert n2 == n0 - 16 + 32 + 16, (n0, n2)
    # moments zeroed on touched slots
    assert float(jnp.sum(jnp.abs(ad2.mu.means))) == 0.0

    p3, a3, _, _ = cull_only(cfg, p2, a2, ad2, st2, step=16000)
    assert int(jnp.sum(a3)) <= n2

    p4, ad4 = reset_opacity(cfg, p2, ad2)
    max_logit = float(np.log(0.2 / 0.8))
    assert float(jnp.max(jnp.where(a2 > 0.5, p4.opacities, -100.0))) <= max_logit + 1e-5


def test_capacity_growth_on_overflow():
    """The shipping capacity policy: start tight (capacity_margin x
    seeds) and grow when a densify event fills >= 95% of capacity
    (TrainConfig.capacity docstring). Pins (a) the growth trigger fires
    through the real refinement cadence, (b) training continues across
    the recompile boundary with finite loss, (c) grown dead slots stay
    dead (alive mask)."""
    scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=4,
                                 width=64, height=48,
                                 pair_capacity=1 << 14)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    trainer = Trainer(
        data=scene,
        seed_points=(pts, cols),
        model_cfg=ModelConfig(
            warmup_length=2, refine_every=4, reset_alpha_every=1000,
            densify_grad_thresh=1e-9,  # densify everything visible
            densify_size_thresh=1e9,   # ... by duplication
            sh_degree=1, num_downscales=0,
        ),
        train_cfg=TrainConfig(pair_capacity=1 << 14, chunk=32, tile_block=4,
                              seed=3, capacity=320, capacity_growth=1.5,
                              steps_per_eval_image=0),
    )
    assert trainer.params.capacity == 320
    n0 = int(jnp.sum(trainer.alive))
    hist = trainer.train(num_steps=30, log_every=10)
    assert trainer.params.capacity > 320, "growth never triggered"
    assert trainer.params.capacity % 4096 == 0
    n1 = int(jnp.sum(trainer.alive))
    assert n1 > n0
    assert np.isfinite([h["loss"] for h in hist]).all()
    # Adam state and stats track the new capacity
    assert trainer.adam.mu.means.shape[0] == trainer.params.capacity
    assert trainer.stats.grad_sum.shape[0] == trainer.params.capacity
    assert n1 <= trainer.params.capacity


def test_default_capacity_margin_applies():
    """capacity == 0 resolves to capacity_margin x seeds (rounded to
    4096, floor 4096) instead of the old 2x padding."""
    scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=2,
                                 width=64, height=48,
                                 pair_capacity=1 << 14)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    big_pts = np.tile(pts, (40, 1))
    big_cols = np.tile(cols, (40, 1))
    trainer = Trainer(
        data=scene, seed_points=(big_pts, big_cols),
        model_cfg=ModelConfig(sh_degree=1, num_downscales=0),
        train_cfg=TrainConfig(pair_capacity=1 << 14, chunk=32, tile_block=4,
                              auto_pair_capacity=False),
    )
    n_seed = big_pts.shape[0]
    expect = max(4096, int(np.ceil(1.25 * n_seed / 4096) * 4096))
    assert trainer.params.capacity == expect


def test_normal_loss_grads_finite_with_empty_pixels():
    """Regression: jnp.linalg.norm has a NaN gradient at exactly zero;
    empty-background pixels' composited normals used to poison whole
    tiles (0 * NaN) and NaN the quaternion gradients within one step."""
    from dnsplatter_tpu.models.dn_model import (
        ModelConfig, compute_loss, get_outputs,
    )
    from dnsplatter_tpu.models.gaussians import init_from_points
    from dnsplatter_tpu.ops.rasterize import RasterizeConfig
    from dnsplatter_tpu.data.synthetic import make_synthetic_scene

    scene = make_synthetic_scene(seed=0, n_gaussians=120, n_cameras=1,
                                 width=64, height=64,
                                 pair_capacity=1 << 12)
    cam, batch = scene.get(0)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    # isotropic scales + sparse gaussians guarantee empty pixels
    params, alive, _ = init_from_points(jax.random.PRNGKey(0), pts, cols,
                                        sh_degree=1)
    mc = ModelConfig(use_normal_loss=True, warmup_length=10_000, sh_degree=1)
    cfg = RasterizeConfig(width=64, height=64, tile_size=16, chunk=32,
                          tile_block=2, pair_capacity=1 << 12)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p):
        out, _ = get_outputs(p, alive, cam, mc, cfg, sh_degree=1,
                             background=jnp.zeros((3,)), training=True,
                             rng=jax.random.PRNGKey(5))
        l, _ = compute_loss(out, batch_j, p, alive, cam, mc,
                            jnp.asarray(0), jax.random.PRNGKey(6))
        return l

    g = jax.grad(loss_fn)(params)
    for f in g.__dataclass_fields__:
        assert np.isfinite(np.asarray(getattr(g, f))).all(), f


def test_auto_pair_capacity_sizes_from_data():
    """auto_pair_capacity audits raw pair counts at init and right-sizes
    the static capacity (chunk-aligned, covers every frame's pairs)."""
    import jax
    import numpy as np

    from dnsplatter_tpu.data.synthetic import make_synthetic_scene
    from dnsplatter_tpu.models.dn_model import ModelConfig
    from dnsplatter_tpu.train.trainer import TrainConfig, Trainer

    scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=2,
                                 width=64, height=64,
                                 pair_capacity=1 << 13)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    tr = Trainer(
        data=scene, seed_points=(pts, cols),
        model_cfg=ModelConfig(sh_degree=1, warmup_length=100),
        train_cfg=TrainConfig(pair_capacity=1 << 20, chunk=32,
                              tile_block=4, steps_per_eval_image=0,
                              auto_pair_capacity=True,
                              auto_capacity_margin=2.0),
    )
    cap = tr.train_cfg.pair_capacity
    assert cap < (1 << 20), "capacity not shrunk from the oversized default"
    assert cap % 32 == 0
    h = tr.train(num_steps=4, log_every=4)
    assert np.isfinite(h[-1]["loss"])


def test_cam_opt_multi_dispatch_matches_single():
    """Pose optimization now lives inside the jitted step, so k-step
    dispatch (lax.scan) must reproduce the single-dispatch sequence
    exactly — tangents included (pre-round-3 the trainer force-disabled
    multi-step dispatch whenever the camera optimizer was on)."""

    def make(k_dispatch):
        scene = make_synthetic_scene(seed=0, n_gaussians=300, n_cameras=4,
                                     width=64, height=48,
                                     pair_capacity=1 << 14)
        mc = ModelConfig(
            use_depth_loss=True, depth_lambda=0.2, use_normal_loss=True,
            warmup_length=10_000, sh_degree=1,
            camera_optimizer_mode="SO3xR3",
        )
        pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
        return Trainer(
            data=scene, seed_points=(pts, cols), model_cfg=mc,
            train_cfg=TrainConfig(pair_capacity=1 << 14, chunk=32,
                                  tile_block=4, seed=3,
                                  steps_per_dispatch=k_dispatch),
            optim_cfg=OptimConfig(accum_camera_opt=4),
        )

    # One full accumulation window (4 steps = 1 Adam apply). Longer runs
    # are sign-unstable by construction: Adam on near-zero accumulated
    # pose grads amplifies f32 fusion differences (scan vs non-scan)
    # into sign flips, so cross-mode comparison is only meaningful per
    # apply window.
    t1 = make(1)
    t1.train(num_steps=4, log_every=4)
    t4 = make(4)
    t4.train(num_steps=4, log_every=4)
    adj1 = np.asarray(t1.cam_opt.adj)
    assert np.abs(adj1).max() > 0.0, "pose tangents never moved"
    np.testing.assert_allclose(adj1, np.asarray(t4.cam_opt.adj),
                               rtol=1e-5, atol=1e-8)
    assert int(t1.cam_opt.count) == int(t4.cam_opt.count) == 1
    np.testing.assert_allclose(np.asarray(t1.params.means),
                               np.asarray(t4.params.means),
                               rtol=1e-5, atol=1e-7)
