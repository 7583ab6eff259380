"""End-to-end CLI: train -> checkpoint -> eval -> export on a tiny
on-disk nerfstudio-format dataset built from the synthetic scene."""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np


def _make_dataset(tmp: Path):
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.data.synthetic import make_synthetic_scene

    scene = make_synthetic_scene(seed=0, n_gaussians=150, n_cameras=4,
                                 width=48, height=48,
                                 pair_capacity=1 << 12)
    (tmp / "images").mkdir()
    (tmp / "mono_depth").mkdir()
    frames = []
    for i in range(len(scene)):
        cam, batch = scene.get(i)
        io.write_image(tmp / f"images/frame_{i:04d}.png", batch["image"])
        np.save(tmp / f"mono_depth/frame_{i:04d}_aligned.npy",
                batch["sensor_depth"][..., 0])
        frames.append({
            "file_path": f"images/frame_{i:04d}.png",
            "transform_matrix": np.asarray(cam.c2w).tolist(),
        })
    meta = {"fl_x": 80.0, "fl_y": 80.0, "cx": 24.0, "cy": 24.0,
            "w": 48, "h": 48, "frames": frames,
            "ply_file_path": "seed.ply"}
    (tmp / "transforms.json").write_text(json.dumps(meta))
    pts, cols = scene.seed_points(jax.random.PRNGKey(1))
    io.write_ply(tmp / "seed.ply", pts, colors=cols)


def test_cli_train_eval_export(tmp_path):
    _make_dataset(tmp_path)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out_dir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "-m", "dnsplatter_tpu.cli", "train",
         "dn-splatter", "normal-nerfstudio",
         "--data", str(tmp_path), "--output-dir", str(out_dir),
         "--max-iterations", "4",
         "--model.use-depth-loss", "true", "--model.sh-degree", "1",
         "--train.pair-capacity", "4096", "--train.chunk", "32",
         "--train.tile-block", "2", "--train.steps-per-eval-image", "0",
         "--train.backend", "xla"],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-800:]
    ckpts = sorted(out_dir.glob("ckpt_*.npz"))
    assert ckpts

    r3 = subprocess.run(
        [sys.executable, "-m", "dnsplatter_tpu.cli", "export", "gaussians",
         "--checkpoint", str(ckpts[-1]),
         "--dataparser", "normal-nerfstudio", "--data", str(tmp_path),
         "--output-dir", str(tmp_path / "exports")],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert r3.returncode == 0, r3.stderr[-800:]
    assert (tmp_path / "exports" / "Gaussians_pcd.ply").exists()


import pytest


@pytest.mark.parametrize("method", ["gnerfacto", "gdepthfacto", "gneusfacto"])
def test_cli_train_baseline_methods(tmp_path, method):
    """The reference registers gnerfacto/gdepthfacto/gneusfacto as
    first-class trainable methods (eval_configs.py:29-160); the same
    names must train from this CLI and write a checkpoint."""
    _make_dataset(tmp_path)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out_dir = tmp_path / f"run_{method}"
    r = subprocess.run(
        [sys.executable, "-m", "dnsplatter_tpu.cli", "train",
         method, "normal-nerfstudio",
         "--data", str(tmp_path), "--output-dir", str(out_dir),
         "--max-iterations", "8"],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-800:]
    assert (out_dir / f"baseline_{method}.npz").exists()
    hist = json.loads(
        (out_dir / f"baseline_{method}_history.json").read_text()
    )
    assert np.isfinite([h["loss"] for h in hist]).all()
