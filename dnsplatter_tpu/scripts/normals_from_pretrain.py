"""Monocular normal prior generation (offline tool, gated on weights).

Parity: dn_splatter/scripts/normals_from_pretrain.py — Omnidata DPT-hybrid
384x384 batched inference (:149-236) writing `normals_from_pretrain/`
pngs in the omnidata convention the dataparsers expect, plus the DSINE
path (:104-148) and the HD patch-merge variant (:238-285).

Both backends run torch-free JAX ports from converted npz weights:

  * omnidata (the reference default): `--ckpt omnidata.npz` produced by
    `python -m dnsplatter_tpu.priors.convert --dpt
    omnidata_dpt_normal_v2.ckpt omnidata.npz` runs the native DPT-Hybrid
    (priors/dpt.py, oracle-tested against transformers' torch DPT). A
    `.ckpt`/`.pt` path falls back to the torch omnidata-tools wrapper
    for environments that have it.
  * dsine: priors/dsine.py (encoder+decoder+NRN, oracle-tested) from
    `python -m dnsplatter_tpu.priors.convert dsine.pt dsine.npz`.

With no egress the checkpoints must be supplied locally. The weight-free
alternative lives in scripts/normals_from_depth.py
(`normals_from_depths`, reference :412-505).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_omnidata_predictor(ckpt_path: Path, resolution: int = 384):
    """Omnidata normal predictor: (R, R, 3) rgb in [0, 1] -> (R, R, 3)
    in [0, 1] (clamped raw model output, reference
    normals_from_pretrain.py:205-211). An `.npz` path runs the native
    JAX DPT-Hybrid (priors/dpt.py); a torch checkpoint falls back to
    the omnidata-tools wrapper."""
    if Path(ckpt_path).suffix == ".npz":
        import jax

        from dnsplatter_tpu.priors.dpt import DPTHybridConfig, run_normals

        if not Path(ckpt_path).exists():
            raise SystemExit(
                f"Converted omnidata npz not found at {ckpt_path}. Produce "
                "it offline with: python -m dnsplatter_tpu.priors.convert "
                "--dpt omnidata_dpt_normal_v2.ckpt omnidata.npz"
            )
        loaded = dict(np.load(ckpt_path))
        params = {k: jax.numpy.asarray(v) for k, v in loaded.items()}
        cfg = DPTHybridConfig(out_channels=3)
        fwd = jax.jit(lambda img: run_normals(params, img, cfg))

        def predict(rgb01: np.ndarray) -> np.ndarray:
            return np.asarray(fwd(rgb01.astype(np.float32)))

        return predict

    model = load_omnidata(ckpt_path)
    import torch

    def predict(rgb01: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            t = torch.from_numpy(
                np.transpose(rgb01, (2, 0, 1)).astype(np.float32)
            )[None]
            n01 = model(t).squeeze(0).cpu().numpy()  # (3, R, R) in [0,1]
        return np.transpose(n01, (1, 2, 0))

    return predict


def load_omnidata(ckpt_path: Path):
    try:
        import torch  # noqa: F401
    except ImportError as e:
        raise SystemExit(f"torch unavailable: {e}")
    if not Path(ckpt_path).exists():
        raise SystemExit(
            f"Omnidata checkpoint not found at {ckpt_path}. Download "
            "omnidata_dpt_normal_v2.ckpt offline (the reference's "
            "download_scripts/download_omnidata.sh) or use "
            "scripts/normals_from_depth.py instead."
        )
    try:
        from omnidata_tools.torch.modules.midas.dpt_depth import DPTDepthModel
    except ImportError:
        raise SystemExit(
            "omnidata-tools not installed; normals-from-pretrain needs it "
            "(offline preprocessing tool, not part of the training loop)."
        )
    import torch

    model = DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    model.load_state_dict(
        {k.replace("model.", ""): v for k, v in state.items()}, strict=False
    )
    model.eval()
    return model


def run_monocular_normals(image_dir: Path, out_dir: Path,
                          ckpt_path: Path, resolution: int = 384) -> int:
    from dnsplatter_tpu.data import io

    predict = load_omnidata_predictor(ckpt_path, resolution)
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    for img_path in images:
        img = io.read_image(img_path)
        h, w = img.shape[:2]
        small = io.resize_image(img, resolution, resolution)
        normal = predict(small)  # (R, R, 3) in [0, 1]
        normal = io.resize_image(normal, h, w)
        io.write_image(out_dir / f"{img_path.stem}.png",
                       np.clip(normal, 0, 1))
    return len(images)


def run_monocular_normals_hd(image_dir: Path, out_dir: Path,
                             ckpt_path: Path, patch: int = 384) -> int:
    """HD variant (reference :238-285): overlapping-patch inference +
    Kabsch-aligned merge (scripts/normals_hd.py)."""
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.scripts.normals_hd import predict_normals_hd

    predict = load_omnidata_predictor(ckpt_path, patch)

    def predictor(rgb: np.ndarray) -> np.ndarray:
        return predict(rgb) * 2.0 - 1.0

    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    for img_path in images:
        rgb = io.read_image(img_path)
        n = predict_normals_hd(rgb, predictor, patch=patch)
        io.write_image(out_dir / f"{img_path.stem}.png",
                       np.clip((n + 1.0) * 0.5, 0, 1))
    return len(images)


def run_dsine_normals(image_dir: Path, out_dir: Path, ckpt_path: Path,
                      intrinsics: np.ndarray | None = None) -> int:
    """DSINE backend (reference run_monocular_dsine, :104-148): the JAX
    port (priors/dsine.py) run per image; LUF->RUF flip and [0,1] png
    encoding match the reference exactly."""
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.priors.dsine import load_params, predict_normals

    if not Path(ckpt_path).exists():
        raise SystemExit(
            f"DSINE npz weights not found at {ckpt_path}. Download dsine.pt "
            "(huggingface camenduru/DSINE) offline and convert once with: "
            "python -m dnsplatter_tpu.priors.convert dsine.pt dsine.npz"
        )
    params = load_params(str(ckpt_path))
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    for img_path in images:
        rgb = io.read_image(img_path)
        rgb_u8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        n = predict_normals(params, rgb_u8, K=intrinsics)  # (H, W, 3) in [-1,1]
        n = n * np.array([-1.0, 1.0, 1.0])  # LUF -> RUF like the reference
        io.write_image(out_dir / f"{img_path.stem}.png",
                       np.clip((n + 1.0) * 0.5, 0, 1))
    return len(images)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--image-dir", type=Path, default=None)
    p.add_argument("--ckpt", type=Path,
                   default=Path("omnidata_dpt_normal_v2.ckpt"))
    p.add_argument("--model-type", choices=("omnidata", "dsine"),
                   default="omnidata")
    p.add_argument("--hd", action="store_true",
                   help="overlapping-patch HD inference + aligned merge")
    args = p.parse_args(argv)
    image_dir = args.image_dir or args.data / "images"
    out_dir = args.data / "normals_from_pretrain"
    if args.model_type == "dsine":
        n = run_dsine_normals(image_dir, out_dir, args.ckpt)
    else:
        run = run_monocular_normals_hd if args.hd else run_monocular_normals
        n = run(image_dir, out_dir, args.ckpt)
    print(f"wrote {n} normal maps")


if __name__ == "__main__":
    main()
