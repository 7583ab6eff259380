"""File IO: images, depth maps, normal maps, PLY point clouds.

Self-contained replacements for the reference's Open3D/PIL/nerfstudio IO
helpers (Open3D is not a dependency here). Depth conventions follow the
reference (data/dn_dataset.py:119-194): 16-bit PNG in millimetres scaled
by depth_unit_scale_factor (default 1e-3) * dataparser scale, or raw .npy
in metres.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# images
# --------------------------------------------------------------------------


def read_image(path: Path) -> np.ndarray:
    """(H, W, 3) float32 RGB in [0, 1]."""
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    return arr[..., :3]


def write_image(path: Path, img: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(img), 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]  # PIL cannot encode (H, W, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def resize_image(img: np.ndarray, height: int, width: int,
                 nearest: bool = False) -> np.ndarray:
    """Resize (H, W[, C]) float array (PIL bilinear / nearest)."""
    from PIL import Image

    if img.shape[0] == height and img.shape[1] == width:
        return img
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    chans = []
    for c in range(img.shape[-1]):
        p = Image.fromarray(img[..., c].astype(np.float32), mode="F")
        p = p.resize((width, height),
                     Image.NEAREST if nearest else Image.BILINEAR)
        chans.append(np.asarray(p, np.float32))
    out = np.stack(chans, axis=-1)
    return out[..., 0] if squeeze else out


# --------------------------------------------------------------------------
# depth / normals
# --------------------------------------------------------------------------


def read_depth(path: Path, scale_factor: float = 1.0) -> np.ndarray:
    """(H, W, 1) float32 depth in scene units.

    PNG: 16-bit millimetre depth * scale_factor (the caller passes
    depth_unit_scale_factor * dataparser_scale, reference
    dn_dataset.py:128-152). NPY: metres * dataparser scale.
    """
    path = Path(path)
    if path.suffix == ".npy":
        d = np.load(path).astype(np.float32) * scale_factor
    else:
        from PIL import Image

        d = np.asarray(Image.open(path)).astype(np.float32) * scale_factor
    if d.ndim == 2:
        d = d[..., None]
    return d[..., :1]


def write_depth_png(path: Path, depth: np.ndarray, unit: float = 1e-3) -> None:
    """16-bit PNG depth (millimetres by default)."""
    from PIL import Image

    # clip BEFORE the uint16 cast: values past 65535 would otherwise
    # wrap around into small, valid-looking depths
    d = np.clip(np.asarray(depth).squeeze() / unit, 0, 65535)
    # Pillow infers mode I;16 from the uint16 dtype (the explicit mode
    # argument is deprecated for removal in Pillow 13)
    Image.fromarray(d.astype(np.uint16)).save(path)


def read_normal(
    path: Path,
    format: str = "omnidata",
    c2w: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(H, W, 3) normals in [0, 1] image encoding.

    Matches GDataset.get_normal_image_from_path (dn_dataset.py:204-268):
    png/npy in [0,1]; 'omnidata' applies the OpenGL->OpenCV component flip
    (1,-1,-1) in [-1,1] space; optional camera->world rotation (SDFStudio
    'dsine'/world formats) when c2w given.
    """
    path = Path(path)
    if path.suffix == ".npy":
        n = np.load(path).astype(np.float32)
        if n.ndim == 3 and n.shape[0] == 3:
            n = np.transpose(n, (1, 2, 0))
    else:
        from PIL import Image

        n = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    n = n[..., :3]
    vec = 2.0 * n - 1.0
    rot = None if c2w is None else np.asarray(c2w)[:3, :3]
    if format == "omnidata":
        vec = vec * np.array([1.0, -1.0, -1.0], np.float32)
        if rot is not None:
            # the flip put vec in the OpenCV camera frame; the c2w is
            # OpenGL-convention, so compose with the axis flip
            rot = rot @ np.diag([1.0, -1.0, -1.0])
    if rot is not None:
        vec = vec @ rot.T
    return (vec + 1.0) * 0.5


# --------------------------------------------------------------------------
# PLY
# --------------------------------------------------------------------------

_PLY_TYPES = {
    "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
    "float64": ("d", 8), "uchar": ("B", 1), "uint8": ("B", 1),
    "char": ("b", 1), "int8": ("b", 1), "short": ("h", 2), "ushort": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4), "uint32": ("I", 4),
}


_PLY_NP_TYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8",
    "float64": "<f8", "uchar": "u1", "uint8": "u1",
    "char": "i1", "int8": "i1", "short": "<i2",
    "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def read_ply(path: Path) -> Dict[str, np.ndarray]:
    """Read vertex (and face) data from ascii / binary_little_endian PLY.

    Returns dict with 'points' (N,3), optionally 'colors' (N,3 in [0,1]),
    'normals' (N,3), and 'faces' (F,3) for triangle meshes. Replaces
    Open3D read_point_cloud / read_triangle_mesh for seed clouds and
    reference meshes (mushroom_dataparser.py:474-568 etc.).
    """
    with open(path, "rb") as f:
        line = f.readline().strip()
        if line != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertex = 0
        n_face = 0
        props = []  # (name, type) for the vertex element
        face_list_types = None  # (count type, index type)
        current = None
        while True:
            line = f.readline().strip().decode("ascii")
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                current = name
                if name == "vertex":
                    n_vertex = int(cnt)
                elif name == "face":
                    n_face = int(cnt)
            elif line.startswith("property") and current == "vertex":
                parts = line.split()
                if parts[1] == "list":
                    raise ValueError("list property in vertex element")
                props.append((parts[2], parts[1]))
            elif line.startswith("property list") and current == "face":
                parts = line.split()
                face_list_types = (parts[2], parts[3])
            elif line == "end_header":
                break

        names = [p[0] for p in props]
        faces = None
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n_vertex, dtype=np.float64)
            rows = np.atleast_2d(rows)
            data = {n: rows[:, i] for i, n in enumerate(names)}
            if n_face:
                frows = np.loadtxt(f, max_rows=n_face, dtype=np.int64)
                frows = np.atleast_2d(frows)
                faces = frows[:, 1:4].astype(np.int32)
        elif fmt == "binary_little_endian":
            dt = np.dtype([(n, _PLY_NP_TYPES[t]) for n, t in props])
            raw = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt,
                                count=n_vertex)
            data = {n: raw[n].astype(np.float64) for n in names}
            if n_face and face_list_types is not None:
                cnt_t = _PLY_NP_TYPES[face_list_types[0]]
                idx_t = _PLY_NP_TYPES[face_list_types[1]]
                fdt = np.dtype([("n", cnt_t), ("idx", idx_t, (3,))])
                raw_f = f.read(fdt.itemsize * n_face)
                if len(raw_f) >= fdt.itemsize * n_face:
                    rec = np.frombuffer(raw_f, dtype=fdt, count=n_face)
                    if (rec["n"] == 3).all():
                        faces = rec["idx"].astype(np.int32)
        else:
            raise ValueError(f"unsupported PLY format {fmt}")

    out: Dict[str, np.ndarray] = {
        "points": np.stack([data["x"], data["y"], data["z"]], -1).astype(
            np.float32
        )
    }
    if all(k in data for k in ("red", "green", "blue")):
        cols = np.stack([data["red"], data["green"], data["blue"]], -1)
        if cols.size and cols.max() > 1.0:
            cols = cols / 255.0
        out["colors"] = cols.astype(np.float32)
    if all(k in data for k in ("nx", "ny", "nz")):
        out["normals"] = np.stack(
            [data["nx"], data["ny"], data["nz"]], -1
        ).astype(np.float32)
    if faces is not None:
        out["faces"] = faces
    return out


def write_ply(
    path: Path,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    faces: Optional[np.ndarray] = None,
) -> None:
    """Write binary_little_endian PLY (point cloud or triangle mesh)."""
    n = len(points)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if normals is not None:
        header += ["property float nx", "property float ny",
                   "property float nz"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    if faces is not None:
        header += [f"element face {len(faces)}",
                   "property list uchar int vertex_indices"]
    header.append("end_header")

    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if colors is not None:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    rec = np.empty(n, dtype=np.dtype(fields))
    rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
    if normals is not None:
        rec["nx"], rec["ny"], rec["nz"] = (
            normals[:, 0], normals[:, 1], normals[:, 2]
        )
    if colors is not None:
        scale_up = colors.size and colors.max() <= 1.0 + 1e-6
        cols = colors * 255.0 if scale_up else colors
        cols = np.clip(cols, 0, 255).astype(np.uint8)
        rec["red"], rec["green"], rec["blue"] = cols[:, 0], cols[:, 1], cols[:, 2]

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())
        if faces is not None:
            fc = faces.astype("<i4")
            frec = np.empty(
                len(fc), dtype=np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
            )
            frec["n"] = 3
            frec["idx"] = fc
            f.write(frec.tobytes())
