"""Monocular depth prior generation (offline torch tool, gated).

Parity: dn_splatter/scripts/depth_from_pretrain.py — ZoeDepth (ZoeD_N via
torch.hub) inference per frame, then per-frame scale/shift alignment to
sensor depth (:89-144) producing mono_depth/*_aligned.npy.

Network inference needs torch weights; with no network egress the hub
cache must be pre-populated (TORCH_HOME). The alignment math itself is
the native implementation in scripts/align_depth.py (closed-form WLS
instead of the reference's Adam loop — exact optimum of the same
objective).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dnsplatter_tpu.scripts.align_depth import align_mono_to_sensor


def load_zoedepth():
    try:
        import torch

        model = torch.hub.load("isl-org/ZoeDepth", "ZoeD_N",
                               pretrained=True, trust_repo=True)
        model.eval()
        return model
    except Exception as e:  # no weights cached / no net
        raise SystemExit(
            "ZoeDepth unavailable (needs cached torch.hub weights): "
            f"{e}\nPre-populate TORCH_HOME offline, or use sensor depths."
        )


def run_monocular_depth(image_dir: Path, out_dir: Path,
                        sensor_dir: Path = None,
                        depth_unit: float = 1e-3) -> int:
    import torch

    from dnsplatter_tpu.data import io

    model = load_zoedepth()
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    sensors = sorted(sensor_dir.glob("*")) if sensor_dir else []
    n = 0
    for i, img_path in enumerate(images):
        img = io.read_image(img_path)
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(img, (2, 0, 1)))[None]
            pred = model.infer(t).squeeze().cpu().numpy()
        np.save(out_dir / f"{img_path.stem}.npy", pred.astype(np.float32))
        if i < len(sensors):
            sensor = io.read_depth(sensors[i], depth_unit)[..., 0]
            if sensor.shape == pred.shape:
                aligned = align_mono_to_sensor(pred, sensor)
                np.save(out_dir / f"{img_path.stem}_aligned.npy", aligned)
        n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--image-dir", type=Path, default=None)
    p.add_argument("--sensor-dir", type=Path, default=None)
    args = p.parse_args(argv)
    image_dir = args.image_dir or args.data / "images"
    out = run_monocular_depth(image_dir, args.data / "mono_depth",
                              args.sensor_dir)
    print(f"wrote {out} mono depths")


if __name__ == "__main__":
    main()
