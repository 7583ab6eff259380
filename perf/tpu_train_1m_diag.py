"""Decompose the 1M-seed train step's 341 ms (perf/tpu_train_1m.py).

A bench frame at N=1M/5.24M pairs is ~130 ms fwd+bwd; the 640x480
train step runs the same machinery at 2M CAPACITY / 4.8M pairs plus
losses, Adam, and refinement stats — variants here isolate where the
rest goes. Each variant: 20 compile steps + 30 timed.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from dnsplatter_tpu.data.synthetic import make_synthetic_scene
from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.train.trainer import TrainConfig, Trainer

scene = make_synthetic_scene(seed=0, n_gaussians=2000, n_cameras=8,
                             width=640, height=480, pair_capacity=1 << 20)
pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.02)
reps = 500
pts = np.concatenate([pts + np.random.default_rng(i).normal(0, 0.02, pts.shape)
                      for i in range(reps)]).astype(np.float32)
cols = np.concatenate([cols] * reps).astype(np.float32)

BASE_MODEL = dict(use_depth_loss=True, depth_lambda=0.2,
                  use_normal_loss=True, sh_degree=1, warmup_length=10_000)
BASE_TRAIN = dict(chunk=128, tile_block=16, steps_per_dispatch=10,
                  steps_per_eval_image=0, auto_pair_capacity=True,
                  backend="auto")


def run(name, model_kw=None, train_kw=None):
    mk = dict(BASE_MODEL, **(model_kw or {}))
    tk = dict(BASE_TRAIN, **(train_kw or {}))
    tr = Trainer(data=scene, seed_points=(pts, cols),
                 model_cfg=ModelConfig(**mk), train_cfg=TrainConfig(**tk))
    tr.train(num_steps=20, log_every=1000)
    t0 = time.time()
    tr.train(num_steps=30, log_every=1000)
    dt = (time.time() - t0) / 30
    print(f"{name}: {dt * 1e3:.0f} ms/step (capacity {tr.params.capacity}, "
          f"pairs {tr.train_cfg.pair_capacity})", flush=True)
    return dt


run("baseline(341ref)")
run("depthq", train_kw=dict(sort_scheme="depthq"))
run("dispatch1", train_kw=dict(steps_per_dispatch=1))
run("no_losses", model_kw=dict(use_depth_loss=False, use_normal_loss=False))
run("sh0", model_kw=dict(sh_degree=0))
run("cap1.2M", train_kw=dict(capacity=1_201_152, sort_scheme="depthq"))
