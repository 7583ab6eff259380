"""COLMAP SfM wrappers (offline; need the `colmap` binary on PATH).

Parity: dn_splatter/scripts/convert_colmap.py (feature extraction /
matching / mapping over an image dir) and poses_to_colmap_sfm.py (export
known poses to COLMAP format and triangulate the sparse cloud).
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path

import numpy as np

from dnsplatter_tpu.data.colmap_utils import rotmat_to_qvec


def run_colmap(image_dir: Path, out_dir: Path, matcher: str = "sequential",
               camera_model: str = "OPENCV") -> Path:
    """feature_extractor -> matcher -> mapper (convert_colmap.py:43-60)."""
    if shutil.which("colmap") is None:
        raise SystemExit("colmap binary not found on PATH")
    out_dir.mkdir(parents=True, exist_ok=True)
    db = out_dir / "database.db"
    sparse = out_dir / "sparse"
    sparse.mkdir(exist_ok=True)
    subprocess.run(
        ["colmap", "feature_extractor", "--database_path", str(db),
         "--image_path", str(image_dir),
         "--ImageReader.camera_model", camera_model,
         "--ImageReader.single_camera", "1"],
        check=True,
    )
    subprocess.run(
        ["colmap", f"{matcher}_matcher", "--database_path", str(db)],
        check=True,
    )
    subprocess.run(
        ["colmap", "mapper", "--database_path", str(db),
         "--image_path", str(image_dir), "--output_path", str(sparse)],
        check=True,
    )
    return sparse / "0"


def poses_to_colmap_text(
    c2ws_gl: np.ndarray,  # (N, 4, 4) OpenGL camera-to-world
    names: list,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int,
    out_dir: Path,
) -> None:
    """Write cameras.txt / images.txt (+ empty points3D.txt) for known
    poses so `colmap point_triangulator` can build the sparse cloud
    (poses_to_colmap_sfm.py)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "cameras.txt", "w") as f:
        f.write(f"1 PINHOLE {width} {height} {fx} {fy} {cx} {cy}\n")
    with open(out_dir / "images.txt", "w") as f:
        for i, (c2w, name) in enumerate(zip(c2ws_gl, names)):
            cv = np.asarray(c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
            rot = cv[:3, :3].T  # world-to-camera
            t = -rot @ cv[:3, 3]
            q = rotmat_to_qvec(rot)
            f.write(
                f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                f"{t[0]} {t[1]} {t[2]} 1 {name}\n\n"
            )
    (out_dir / "points3D.txt").write_text("")




def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--matcher", default="sequential",
                   choices=["sequential", "exhaustive"])
    args = p.parse_args(argv)
    model = run_colmap(args.image_dir, args.output_dir, args.matcher)
    print(f"COLMAP model at {model}")


if __name__ == "__main__":
    main()
