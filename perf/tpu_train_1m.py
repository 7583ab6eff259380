"""Reference-default-scale training on TPU: 1M seed Gaussians.

The reference trains MuSHRoom rooms from a 1,000,000-point seed cloud
(mushroom_dataparser.py:97-98). This drives the ACTUAL Trainer (full
loss stack, ADC stats, multi-step dispatch) at that capacity on one
chip — proving the production path holds at the reference's operating
point with no fallback (packed32 binning sort, streamed expand).
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
reps = 500  # ~1M seeds
pts = np.concatenate([pts + np.random.default_rng(i).normal(0, 0.02, pts.shape)
                      for i in range(reps)]).astype(np.float32)
cols = np.concatenate([cols] * reps).astype(np.float32)
print(f"seeds: {len(pts)}", flush=True)
tr = Trainer(
    data=scene, seed_points=(pts, cols),
    model_cfg=ModelConfig(use_depth_loss=True, depth_lambda=0.2,
                          use_normal_loss=True, sh_degree=1,
                          warmup_length=10_000),
    train_cfg=TrainConfig(chunk=128, tile_block=16,
                          steps_per_dispatch=10, steps_per_eval_image=0,
                          auto_pair_capacity=True, backend="auto",
                          # -61 ms/step at this scale: the argsort and
                          # (N,16) table gather it removes price at the
                          # 2M CAPACITY (perf/tpu_train_1m_diag.py)
                          sort_scheme="depthq"),
)
print(f"capacity: {tr.params.capacity}, pair_capacity: "
      f"{tr.train_cfg.pair_capacity}", flush=True)
t0 = time.time()
tr.train(num_steps=20, log_every=20)   # compile + first dispatches
t_compile = time.time() - t0
t0 = time.time()
tr.train(num_steps=50, log_every=50)
dt = (time.time() - t0) / 50
print(f"compile+first: {t_compile:.1f}s; steady: {dt*1e3:.0f} ms/step "
      f"({640*480/dt/1e6:.2f} Mrays/s) at {tr.params.capacity} capacity",
      flush=True)
m = tr.eval_image(0)
print("psnr", round(m["rgb_psnr"], 2), "gaussians", m["gaussian_count"])
