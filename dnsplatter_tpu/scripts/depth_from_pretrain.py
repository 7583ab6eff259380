"""Monocular depth prior generation (offline tool, gated on weights).

Parity: dn_splatter/scripts/depth_from_pretrain.py — ZoeDepth (ZoeD_N via
torch.hub) inference per frame, then per-frame scale/shift alignment to
sensor depth (:89-144) producing mono_depth/*_aligned.npy.

Inference is torch-free given converted npz weights: `--ckpt zoe.npz`
produced by `python -m dnsplatter_tpu.priors.convert --zoe ZoeD_M12_N.pt
zoe.npz` runs the native JAX ZoeDepth-NYU port (priors/zoedepth.py,
oracle-tested against transformers' torch ZoeDepth). Without an npz the
torch.hub wrapper is used (needs a pre-populated TORCH_HOME — no
egress). The alignment math is native either way
(scripts/align_depth.py — closed-form WLS, the exact optimum of the
reference's Adam objective).
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
            f"{e}\nConvert the checkpoint once with `python -m "
            "dnsplatter_tpu.priors.convert --zoe ZoeD_M12_N.pt zoe.npz` "
            "and pass --ckpt zoe.npz, or use sensor depths."
        )


def load_zoedepth_predictor(ckpt_path: Path | None):
    """ZoeDepth predictor: (H, W, 3) rgb in [0, 1] -> (H, W) metric
    depth. An `.npz` path runs the native JAX port; None falls back to
    the torch.hub wrapper (reference behavior,
    depth_from_pretrain.py:155-156)."""
    if ckpt_path is not None and Path(ckpt_path).suffix == ".npz":
        if not Path(ckpt_path).exists():
            raise SystemExit(
                f"Converted ZoeDepth npz not found at {ckpt_path}. Produce "
                "it offline with: python -m dnsplatter_tpu.priors.convert "
                "--zoe ZoeD_M12_N.pt zoe.npz"
            )
        from dnsplatter_tpu.priors.zoedepth import load_params, predict_depth

        params = load_params(str(ckpt_path))

        def predict(rgb01: np.ndarray) -> np.ndarray:
            return predict_depth(params, rgb01)

        return predict

    model = load_zoedepth()
    import torch

    def predict(rgb01: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            t = torch.from_numpy(np.transpose(rgb01, (2, 0, 1)))[None]
            return model.infer(t).squeeze().cpu().numpy()

    return predict


def run_monocular_depth(image_dir: Path, out_dir: Path,
                        sensor_dir: Path = None,
                        depth_unit: float = 1e-3,
                        ckpt_path: Path | None = None) -> int:
    from dnsplatter_tpu.data import io

    predict = load_zoedepth_predictor(ckpt_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    sensors = sorted(sensor_dir.glob("*")) if sensor_dir else []
    n = 0
    for i, img_path in enumerate(images):
        img = io.read_image(img_path)
        pred = predict(img).astype(np.float32)
        np.save(out_dir / f"{img_path.stem}.npy", pred)
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
    p.add_argument("--ckpt", type=Path, default=None,
                   help="converted zoe.npz for torch-free native "
                        "inference (priors/zoedepth.py)")
    args = p.parse_args(argv)
    image_dir = args.image_dir or args.data / "images"
    out = run_monocular_depth(image_dir, args.data / "mono_depth",
                              args.sensor_dir, ckpt_path=args.ckpt)
    print(f"wrote {out} mono depths")


if __name__ == "__main__":
    main()
