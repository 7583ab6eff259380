"""Staged-config-3 validation ON TPU: full DN-Splatter training with ADC
refinement at production scale, per-image eval metrics, TSDF mesh export,
and the visibility-culled mesh protocol — the whole stack end-to-end on
real hardware (BASELINE.md staged configs)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.data.synthetic import make_synthetic_scene
from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.train.trainer import TrainConfig, Trainer

STEPS = 1000
W, H = 640, 480

scene = make_synthetic_scene(seed=0, n_gaussians=4000, n_cameras=8,
                             width=W, height=H, pair_capacity=1 << 20)
pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
reps = 12  # ~48k seeds
pts = np.concatenate(
    [pts + np.random.default_rng(i).normal(0, 0.02, pts.shape)
     for i in range(reps)]).astype(np.float32)
cols = np.concatenate([cols] * reps).astype(np.float32)

tr = Trainer(
    data=scene, seed_points=(pts, cols),
    model_cfg=ModelConfig(
        use_depth_loss=True, depth_lambda=0.2,
        use_normal_loss=True, normal_lambda=0.1,
        sh_degree=2, warmup_length=300, refine_every=100,
        stop_split_at=800,
    ),
    train_cfg=TrainConfig(pair_capacity=1 << 20, chunk=128, tile_block=16,
                          steps_per_dispatch=10, steps_per_eval_image=0,
                          backend="auto"),
)
print(f"seeds {len(pts)}, capacity {tr.params.capacity}", flush=True)
t0 = time.time()
tr.train(num_steps=STEPS, log_every=200)
dt = time.time() - t0
print(f"train {STEPS} steps: {dt:.0f}s ({dt / STEPS * 1e3:.0f} ms/step avg "
      "incl compile + refinement)", flush=True)

# per-image eval metrics (PSNR / depth MAE / normal)
ms = [tr.eval_image(i) for i in range(len(scene))]
psnr = float(np.mean([m["rgb_psnr"] for m in ms]))
dabs = float(np.mean([m.get("depth_abs_rel", np.nan) for m in ms]))
print(f"eval: psnr {psnr:.2f}  depth_abs_rel {dabs:.4f}  "
      f"gaussians {int(np.sum(np.asarray(tr.alive)))}", flush=True)

# TSDF export + visibility-culled mesh metrics vs the GT-rendered TSDF
from pathlib import Path

from dnsplatter_tpu.data import io
from dnsplatter_tpu.mesh.exporters import TSDFExportConfig, export_tsdf

out_dir = Path("/tmp/tpu_e2e")
mesh_path = export_tsdf(
    tr.params, tr.alive, scene, out_dir, model_cfg=tr.model_cfg,
    cfg=TSDFExportConfig(voxel_size=0.04, sdf_trunc=0.16, depth_max=6.0),
    sh_degree=2,
)
gt_mesh_path = export_tsdf(
    scene.gt_params, scene.gt_alive, scene, out_dir / "gt",
    model_cfg=ModelConfig(), cfg=TSDFExportConfig(voxel_size=0.04,
                                                  sdf_trunc=0.16,
                                                  depth_max=6.0),
    sh_degree=0,
)
pd = io.read_ply(mesh_path)
gd = io.read_ply(gt_mesh_path)
pv, pf = pd["points"], pd["faces"]
gv, gf = gd["points"], gd["faces"]
print(f"mesh: {len(pv)} verts / {len(pf)} faces; gt {len(gv)}/{len(gf)}",
      flush=True)

from dnsplatter_tpu.eval.mesh_metrics import evaluate_mesh

mm = evaluate_mesh(pv, pf, gv, gf, [scene.get(i)[0] for i in range(4)],
                   max_edge=0.03, num_samples=50_000)
print("mesh metrics:", {k: round(float(v), 4) for k, v in mm.items()},
      flush=True)
assert np.isfinite(psnr) and psnr > 25.0, psnr
assert np.isfinite(mm["chamfer_l1"]), mm
print("E2E PASS", flush=True)
