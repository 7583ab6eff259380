"""Render Faro scanner reference-mesh depths for MuSHRoom evaluation.

Parity: dn_splatter/data/mushroom_utils/render_gt_depth.py /
render_faro_nm.py — render the laser-scanned reference mesh from the
capture's camera poses (the reference uses pyrender/pytorch3d; here the
JAX z-buffer mesh renderer), writing 16-bit depth pngs that
`eval/offline.py depth_eval_faro` consumes.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", type=Path, required=True,
                   help="Faro reference mesh .ply")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--dataparser", default="mushroom")
    p.add_argument("--split", default="train")
    p.add_argument("--output-dir", type=Path, default=None)
    p.add_argument("--depth-unit", type=float, default=1e-3)
    args = p.parse_args(argv)

    from dnsplatter_tpu.cli import _load_dataset
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.eval.mesh_render import render_mesh_depth

    mesh = io.read_ply(args.mesh)
    verts = mesh["points"]
    faces = mesh.get("faces")
    if faces is None:
        raise SystemExit(f"{args.mesh} has no faces (point cloud?)")

    data = _load_dataset(args.dataparser, args.data, args.split)
    out_dir = args.output_dir or args.data / "reference_depth"
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(len(data)):
        cam, _ = data.get(i)
        depth = render_mesh_depth(verts, faces, cam)
        depth = np.where(np.isfinite(depth), depth, 0.0)
        io.write_depth_png(out_dir / f"{i:05d}.png", depth[..., None],
                           unit=args.depth_unit)
    print(f"wrote {len(data)} reference depths to {out_dir}")


if __name__ == "__main__":
    main()
