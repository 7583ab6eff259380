"""Offline eval over saved render trees + protocol aggregation +
dataset converters."""

import json
from pathlib import Path

import numpy as np

from dnsplatter_tpu.data import io
from dnsplatter_tpu.eval.offline import (
    aggregate_protocols,
    depth_eval,
    rgb_eval,
)


def _render_tree(tmp: Path, n=3, noise=0.05):
    rng = np.random.default_rng(0)
    for sub in ("pred/rgb", "gt/rgb", "pred/depth", "gt/depth"):
        (tmp / sub).mkdir(parents=True)
    for i in range(n):
        gt = rng.uniform(size=(16, 16, 3))
        io.write_image(tmp / f"gt/rgb/{i:05d}.png", gt)
        io.write_image(tmp / f"pred/rgb/{i:05d}.png",
                       np.clip(gt + rng.normal(0, noise, gt.shape), 0, 1))
        d = rng.uniform(1, 3, (16, 16, 1)).astype(np.float32)
        np.save(tmp / f"gt/depth/{i:05d}.npy", d)
        np.save(tmp / f"pred/depth/{i:05d}.npy", d * 1.02)


def test_offline_rgb_depth_eval(tmp_path):
    _render_tree(tmp_path)
    rgb = rgb_eval(tmp_path / "pred/rgb", tmp_path / "gt/rgb")
    assert rgb["num_images"] == 3
    assert 15 < rgb["psnr"] < 40
    dep = depth_eval(tmp_path / "pred/depth", tmp_path / "gt/depth")
    assert abs(dep["abs_rel"] - 0.02) < 0.005


def test_protocol_aggregation():
    rows = [{"psnr": 20.0}, {"psnr": 30.0}, {"psnr": 40.0}]
    labels = ["with", "within", "within"]
    agg = aggregate_protocols(rows, labels)
    assert agg["with_psnr"] == 20.0
    assert agg["within_psnr"] == 35.0
    assert agg["psnr"] == 30.0


def test_nerfstudio_to_sdfstudio(tmp_path):
    from dnsplatter_tpu.data.converters import nerfstudio_to_sdfstudio

    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    frames = []
    for i in range(3):
        io.write_image(src / f"images/f{i}.png", rng.uniform(size=(8, 8, 3)))
        c2w = np.eye(4)
        c2w[:3, 3] = [i * 0.1, 0, 0.5]
        frames.append({"file_path": f"images/f{i}.png",
                       "transform_matrix": c2w.tolist()})
    (src / "transforms.json").write_text(json.dumps(
        {"fl_x": 8.0, "fl_y": 8.0, "cx": 4.0, "cy": 4.0, "w": 8, "h": 8,
         "frames": frames}
    ))
    out = nerfstudio_to_sdfstudio(src, tmp_path / "out")
    meta = json.loads(out.read_text())
    assert len(meta["frames"]) == 3
    m = np.array(meta["frames"][0]["camtoworld"])
    # OpenGL -> OpenCV: y/z columns flipped vs identity
    assert m[1, 1] == -1.0 and m[2, 2] == -1.0

    from dnsplatter_tpu.data.parsers.gsdf import GSDFParserConfig, parse

    ds = parse(GSDFParserConfig(data=tmp_path / "out",
                                skip_every_for_val_split=3), "train")
    assert len(ds) >= 1
    cam, batch = ds.get(0)
    assert batch["image"].shape == (8, 8, 3)
