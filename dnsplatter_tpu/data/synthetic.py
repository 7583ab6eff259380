"""Synthetic Gaussian-mixture scenes for tests and benchmarks.

The reference has no test suite (SURVEY.md section 4); our strategy needs a
ground-truth-complete scene: a random Gaussian mixture rendered by the
framework's own (oracle-verified) rasterizer provides pixel-exact rgb,
depth, and normal supervision targets from any viewpoint, plus a seed
point cloud — everything a dataparser would produce, with no files.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.camera import Camera, look_at
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.ops.render import render


def make_gt_gaussians(key: jax.Array, n: int = 800, extent: float = 1.0,
                      sh_degree: int = 3, scale_shift: float = 0.0,
                      ) -> Tuple[GaussianParams, jax.Array]:
    """A colorful random Gaussian-mixture 'room'.

    `scale_shift` offsets the log-scales: real initializations derive
    scales from 3-NN distances (reference dn_model.py:186-189), which
    shrink as density^(1/3) — pass -ln(N/N0)/3 to emulate an N-point
    seed cloud's splat size at the default N0's overdraw.
    """
    from dnsplatter_tpu.ops.quat import random_quats
    from dnsplatter_tpu.ops.sh import num_sh_bases, rgb_to_sh

    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    scales = jax.random.uniform(
        ks[1], (n, 3), minval=-4.2 + scale_shift, maxval=-2.8 + scale_shift
    )
    quats = random_quats(ks[2], n)
    colors = jax.random.uniform(ks[3], (n, 3), minval=0.05, maxval=0.95)
    opac = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=3.0)  # logits
    b = num_sh_bases(sh_degree)
    params = GaussianParams(
        means=means,
        scales=scales,
        quats=quats,
        features_dc=rgb_to_sh(colors),
        features_rest=jnp.zeros((n, b - 1, 3)),
        opacities=opac,
        normals=jnp.zeros((n, 3)),
    )
    return params, jnp.ones((n,))


def ring_cameras(num: int, radius: float = 3.0, height: float = 0.8,
                 width: int = 96, img_height: int = 72,
                 focal: float = 80.0) -> List[Camera]:
    cams = []
    for i in range(num):
        ang = 2.0 * np.pi * i / num
        eye = (radius * np.cos(ang), height, radius * np.sin(ang))
        c2w = look_at(eye, (0.0, 0.0, 0.0))
        cams.append(
            Camera.create(focal, focal, width / 2, img_height / 2, c2w,
                          width, img_height)
        )
    return cams


@dataclasses.dataclass
class SyntheticScene:
    """SceneSource protocol: __len__ + get(i) -> (Camera, batch dict)."""

    cameras: List[Camera]
    batches: List[Dict[str, np.ndarray]]
    gt_params: GaussianParams
    gt_alive: jax.Array

    def __len__(self) -> int:
        return len(self.cameras)

    def get(self, i: int):
        return self.cameras[i], self.batches[i]

    def seed_points(self, key: jax.Array, noise: float = 0.02,
                    subsample: int = 1):
        """Noisy seed point cloud from the gt means (SfM stand-in)."""
        from dnsplatter_tpu.ops.sh import sh_to_rgb

        pts = np.asarray(self.gt_params.means)[::subsample]
        cols = np.clip(
            np.asarray(sh_to_rgb(self.gt_params.features_dc))[::subsample], 0, 1
        )
        pts = pts + np.asarray(
            jax.random.normal(key, pts.shape) * noise
        )
        return pts.astype(np.float32), cols.astype(np.float32)


def make_synthetic_scene(
    seed: int = 0,
    n_gaussians: int = 800,
    n_cameras: int = 6,
    width: int = 96,
    height: int = 72,
    pair_capacity: int = 1 << 16,
) -> SyntheticScene:
    key = jax.random.PRNGKey(seed)
    kg, _ = jax.random.split(key)
    gt, alive = make_gt_gaussians(kg, n_gaussians)
    cams = ring_cameras(n_cameras, width=width, img_height=height)
    cfg = RasterizeConfig(width=width, height=height, tile_size=16,
                          chunk=32, tile_block=4, pair_capacity=pair_capacity)
    batches = []
    for cam in cams:
        out, _ = render(gt, alive, cam, cfg, sh_degree_to_use=0,
                        background=jnp.zeros((3,)))
        n = out.normal
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
        batches.append(
            {
                "image": np.asarray(out.rgb),
                "sensor_depth": np.asarray(out.depth),
                "normal": np.asarray((n + 1.0) * 0.5),
            }
        )
    return SyntheticScene(cameras=cams, batches=batches, gt_params=gt,
                          gt_alive=alive)
