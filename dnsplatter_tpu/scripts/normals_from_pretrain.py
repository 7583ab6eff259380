"""Monocular normal prior generation (offline torch tool, gated).

Parity: dn_splatter/scripts/normals_from_pretrain.py — Omnidata DPT-hybrid
384x384 batched inference (:149-236) writing `normals_from_pretrain/`
pngs in the omnidata convention the dataparsers expect. The DSINE path
(:104-148) and the HD patch-merge variant (:238-285) are network-weight
tools as well; with no egress the checkpoints must be supplied locally.

The weight-free alternative lives in scripts/normals_from_depth.py
(`normals_from_depths`, reference :412-505).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


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
    import torch

    from dnsplatter_tpu.data import io

    model = load_omnidata(ckpt_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.glob("*") if p.suffix in (".png", ".jpg")
    )
    for img_path in images:
        img = io.read_image(img_path)
        h, w = img.shape[:2]
        small = io.resize_image(img, resolution, resolution)
        with torch.no_grad():
            t = torch.from_numpy(
                np.transpose(small, (2, 0, 1)).astype(np.float32)
            )[None]
            normal = model(t).squeeze(0).cpu().numpy()  # (3, R, R) in [0,1]
        normal = np.transpose(normal, (1, 2, 0))
        normal = io.resize_image(normal, h, w)
        io.write_image(out_dir / f"{img_path.stem}.png",
                       np.clip(normal, 0, 1))
    return len(images)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--image-dir", type=Path, default=None)
    p.add_argument("--ckpt", type=Path,
                   default=Path("omnidata_dpt_normal_v2.ckpt"))
    args = p.parse_args(argv)
    image_dir = args.image_dir or args.data / "images"
    n = run_monocular_normals(image_dir,
                              args.data / "normals_from_pretrain", args.ckpt)
    print(f"wrote {n} normal maps")


if __name__ == "__main__":
    main()
