"""Scene dataset: per-frame multi-channel loading + sequential serving.

Replaces the reference's GDataset (data/dn_dataset.py) +
DNSplatterDataManager (dn_datamanager.py): frames carry rgb, sensor/mono
depth, normals, confidence, mask; channels are lazily loaded, resized to
the rgb resolution, and served **sequentially, not shuffled** — the
reference deliberately preserves t-1, t, t+1 frame ordering
(dn_datamanager.py:93-96).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from dnsplatter_tpu.data import io
from dnsplatter_tpu.ops.camera import Camera


@dataclasses.dataclass
class FrameSpec:
    """Everything needed to materialize one training frame."""

    image_path: Path
    c2w: np.ndarray  # (4, 4) OpenGL camera-to-world (post dataparser)
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    sensor_depth_path: Optional[Path] = None
    mono_depth_path: Optional[Path] = None
    normal_path: Optional[Path] = None
    confidence_path: Optional[Path] = None
    mask_path: Optional[Path] = None
    # Lens distortion, nerfstudio order [k1, k2, k3, k4, p1, p2]; images
    # are undistorted on load (the rasterizer is pinhole-only, like
    # gsplat; nerfstudio's datamanager does the same with cv2).
    distortion: Optional[np.ndarray] = None
    camera_type: str = "perspective"  # or "fisheye"


@dataclasses.dataclass
class SceneDataset:
    """SceneSource protocol (len / get) over parsed frames.

    depth_scale = depth_unit_scale_factor * dataparser_scale, applied to
    png sensor depths (dn_dataset.py:128-152); npy mono depths are scaled
    by dataparser_scale only (they are metric after alignment).
    """

    frames: List[FrameSpec]
    depth_unit_scale_factor: float = 1e-3
    dataparser_scale: float = 1.0
    normal_format: str = "omnidata"
    normal_frame: str = "camera"  # or "world": rotate by c2w when loading
    euclidean_depth: bool = False
    seed_points: Optional[np.ndarray] = None
    seed_colors: Optional[np.ndarray] = None
    seed_normals: Optional[np.ndarray] = None
    cache: bool = True
    # optional per-frame protocol labels (MuSHRoom "with"/"within" eval)
    protocols: Optional[List[str]] = None

    def __post_init__(self):
        self._cache: Dict[int, tuple] = {}

    def __len__(self) -> int:
        return len(self.frames)

    def camera(self, i: int) -> Camera:
        f = self.frames[i]
        return Camera.create(f.fx, f.fy, f.cx, f.cy, f.c2w, f.width, f.height)

    def _undistort(self, f: FrameSpec, arr: np.ndarray,
                   nearest: bool) -> np.ndarray:
        if f.distortion is None or not np.any(np.asarray(f.distortion)):
            return arr
        from dnsplatter_tpu.data.distortion import undistort_image

        return undistort_image(arr, f.fx, f.fy, f.cx, f.cy,
                               np.asarray(f.distortion), f.camera_type,
                               nearest=nearest)

    def get(self, i: int):
        if self.cache and i in self._cache:
            return self._cache[i]
        f = self.frames[i]
        cam = self.camera(i)
        batch: Dict[str, np.ndarray] = {}
        img = io.read_image(f.image_path)
        if img.shape[:2] != (f.height, f.width):
            img = io.resize_image(img, f.height, f.width)
        img = self._undistort(f, img, nearest=False)
        batch["image"] = img

        if f.sensor_depth_path is not None:
            scale = (
                self.depth_unit_scale_factor * self.dataparser_scale
                if f.sensor_depth_path.suffix != ".npy"
                else self.dataparser_scale
            )
            d = io.read_depth(f.sensor_depth_path, scale)
            if d.shape[:2] != (f.height, f.width):
                d = io.resize_image(d[..., 0], f.height, f.width,
                                    nearest=True)[..., None]
            if self.euclidean_depth:
                import jax.numpy as jnp
                from dnsplatter_tpu.ops.camera import euclidean_to_z_depth

                d = np.asarray(
                    euclidean_to_z_depth(jnp.asarray(d), f.fx, f.fy, f.cx, f.cy)
                )
            batch["sensor_depth"] = self._undistort(f, d, nearest=True)
        if f.mono_depth_path is not None:
            d = io.read_depth(f.mono_depth_path, self.dataparser_scale)
            if d.shape[:2] != (f.height, f.width):
                d = io.resize_image(d[..., 0], f.height, f.width,
                                    nearest=True)[..., None]
            batch["mono_depth"] = self._undistort(f, d, nearest=True)
        if f.normal_path is not None:
            c2w = f.c2w if self.normal_frame == "world" else None
            n = io.read_normal(f.normal_path, self.normal_format, c2w)
            if n.shape[:2] != (f.height, f.width):
                n = io.resize_image(n, f.height, f.width)
            batch["normal"] = self._undistort(f, n, nearest=False)
        if f.confidence_path is not None:
            c = io.read_depth(f.confidence_path, 1.0)
            if c.shape[:2] != (f.height, f.width):
                c = io.resize_image(c[..., 0], f.height, f.width,
                                    nearest=True)[..., None]
            batch["confidence"] = self._undistort(f, c, nearest=True)
        if f.mask_path is not None:
            m = io.read_image(f.mask_path)[..., :1]
            if m.shape[:2] != (f.height, f.width):
                m = io.resize_image(m, f.height, f.width, nearest=True)
            m = self._undistort(f, m, nearest=True)
            batch["mask"] = (m > 0.5).astype(np.float32)

        out = (cam, batch)
        if self.cache:
            self._cache[i] = out
        return out

    def seed(self):
        """(points, colors[, normals]) tuple for Gaussian init, or None."""
        if self.seed_points is None:
            return None
        out = [self.seed_points]
        out.append(
            self.seed_colors
            if self.seed_colors is not None
            else np.full_like(self.seed_points, 0.5)
        )
        if self.seed_normals is not None:
            out.append(self.seed_normals)
        return tuple(out)
