"""Render ground-truth normal maps from a mesh along a camera trajectory.

Parity: dn_splatter/data/replica_utils/render_normals.py (Open3D normal
shading, "normal maps are rendered in OpenCV camera coordinates") and
data/mushroom_utils/render_faro_nm.py (pytorch3d barycentric vertex-normal
interpolation of the ICP-aligned Faro mesh). Here the JAX z-buffer mesh
renderer interpolates area-weighted vertex normals; maps are written in
the repo's standard [0, 1] encoding ((n + 1) / 2 per component — the
Faro script's ad-hoc (z + 3) / 4 blue packing is not reproduced), in the
OpenCV camera frame by default (`--frame world` keeps mesh/world-frame
vectors, the Faro script's behavior).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", type=Path, required=True)
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--dataparser", default="mushroom")
    p.add_argument("--split", default="train")
    p.add_argument("--output-dir", type=Path, default=None)
    p.add_argument("--frame", choices=("camera", "world"), default="camera")
    p.add_argument("--icp-json", type=Path, default=None,
                   help="apply inv(gt_transformation) to the mesh first "
                        "(the Faro script's alignment step)")
    args = p.parse_args(argv)

    from dnsplatter_tpu.cli import _load_dataset
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.eval.mesh_render import (
        render_mesh_attributes,
        vertex_normals,
    )

    mesh = io.read_ply(args.mesh)
    verts = np.asarray(mesh["points"], np.float64)
    faces = mesh.get("faces")
    if faces is None:
        raise SystemExit(f"{args.mesh} has no faces (point cloud?)")
    if args.icp_json is not None:
        from dnsplatter_tpu.eval.icp import load_icp_json

        t = np.linalg.inv(load_icp_json(args.icp_json))
        verts = verts @ t[:3, :3].T + t[:3, 3]

    vn = vertex_normals(verts, faces)  # world/mesh frame, unit
    data = _load_dataset(args.dataparser, args.data, args.split)
    out_dir = args.output_dir or args.data / "reference_normal"
    out_dir.mkdir(parents=True, exist_ok=True)
    # name outputs by the source frame's image stem, not position:
    # filename-matched consumers (compare_normals, the parsers' prior
    # lookup) pair by name, and split changes would reshuffle indices
    frames = getattr(data, "frames", None)
    for i in range(len(data)):
        cam, _ = data.get(i)
        stem = (Path(frames[i].image_path).stem
                if frames is not None else f"{i:05d}")
        depth, nmap = render_mesh_attributes(verts, faces, vn, cam)
        hit = np.isfinite(depth)
        norm = np.linalg.norm(nmap, axis=-1, keepdims=True)
        nmap = nmap / np.maximum(norm, 1e-9)
        if args.frame == "camera":
            # world -> OpenCV camera frame (replica_utils convention)
            c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
            nmap = nmap @ c2w_cv[:3, :3]
            # orient toward the viewer (+z faces away in OpenCV)
            flip = np.where(nmap[..., 2:3] > 0, -1.0, 1.0)
            nmap = nmap * flip
        enc = np.where(hit[..., None], (nmap + 1.0) * 0.5, 0.0)
        io.write_image(out_dir / f"{stem}.png", enc)
    print(f"wrote {len(data)} normal maps to {out_dir}")


if __name__ == "__main__":
    main()
