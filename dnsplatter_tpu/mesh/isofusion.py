"""Two-pass normal-weighted TSDF fusion (AGS-Mesh mesher).

Parity target: dn_splatter/scripts/isooctree_dn.py — the AGS-Mesh
recommended mesher evaluates a multi-frame TSDF isoFunc with a two-pass
normal-weighted fusion (:330-460): pass 1 picks a per-voxel reference
normal from the best-aligned frame; pass 2 fuses TSDF observations
weighted by view/normal agreement, skipping back-facing observations
(hole avoidance), plus a depth-validity mask from relative depth deltas
(:19-45). The reference extracts the isosurface with the IsoOctree C++
library; here the fused field meshes through the marching-tetrahedra
isosurfacer on a dense grid (an adaptive-octree backend can swap in
without changing this fusion math).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.mesh import tsdf as tsdf_lib


@dataclasses.dataclass(frozen=True)
class IsoFusionConfig:
    voxel_size: float = 0.02
    tsdf_rel: float = 3.0  # truncation = tsdf_rel * voxel_size
    back_mask_dot: float = 0.1  # skip observations this anti-aligned
    min_weight: float = 1.0
    depth_validity_rel: float = 0.1  # relative delta for validity mask
    chunk: int = 1 << 18


def depth_validity_mask(depth: np.ndarray, rel: float = 0.1) -> np.ndarray:
    """Reject pixels whose depth jumps > rel * depth vs neighbours
    (isooctree_dn.py:19-45)."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    ok = d > 0
    # edge-clamped neighbour diffs: np.roll would wrap borders around and
    # compare e.g. the first row against the last (spuriously invalid)
    pad = np.pad(d, 1, mode="edge")
    for nb in (pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]):
        ok &= np.abs(nb - d) <= rel * np.maximum(d, 1e-6)
    return ok


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _observe(centers, depth, normal_w, validity, w2c_cv, cam_pos,
             fx, fy, cx, cy, h, w, trunc):
    """Per-frame voxel observations: (sdf, obs_normal, ray_dir, valid)."""
    pts_cam = centers @ w2c_cv[:3, :3].T + w2c_cv[:3, 3]
    z = pts_cam[:, 2]
    u = pts_cam[:, 0] * fx / jnp.maximum(z, 1e-8) + cx
    v = pts_cam[:, 1] * fy / jnp.maximum(z, 1e-8) + cy
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 1e-6)
    d = depth[vi, ui]
    ok = in_img & (d > 1e-6) & validity[vi, ui]
    sdf = d - z
    nrm = normal_w[vi, ui]  # (V, 3) world-frame surface normal
    ray = centers - cam_pos
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                            1e-12)
    ok = ok & (sdf >= -trunc)
    return sdf, nrm, ray, ok


def fuse_normal_weighted(
    frames: List[dict],  # each: depth (H,W,1), normal_w (H,W,3) world,
                         # c2w_gl (4,4), fx, fy, cx, cy
    bounds: Tuple[np.ndarray, np.ndarray],
    cfg: IsoFusionConfig = IsoFusionConfig(),
) -> tsdf_lib.TSDFVolume:
    """Two-pass fusion. Pass 1: accumulate validity-weighted normals to
    get a reference normal per voxel. Pass 2: TSDF update weighted by
    agreement between the reference normal and the observation's surface
    normal, with anti-aligned (back-face) observations skipped."""
    trunc = cfg.tsdf_rel * cfg.voxel_size
    vol = tsdf_lib.create_volume(
        bounds[0], bounds[1],
        tsdf_lib.TSDFConfig(voxel_size=cfg.voxel_size, sdf_trunc=trunc),
    )
    centers = tsdf_lib.voxel_centers(vol)
    nvox = centers.shape[0]

    prepped = []
    for fr in frames:
        c2w_cv = np.asarray(fr["c2w_gl"]) @ np.diag([1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w_cv).astype(np.float32)
        validity = depth_validity_mask(fr["depth"], cfg.depth_validity_rel)
        prepped.append(
            dict(
                depth=jnp.asarray(fr["depth"][..., 0], jnp.float32),
                normal=jnp.asarray(fr["normal_w"], jnp.float32),
                validity=jnp.asarray(validity),
                w2c=jnp.asarray(w2c),
                cam_pos=jnp.asarray(c2w_cv[:3, 3], jnp.float32),
                fx=float(fr["fx"]), fy=float(fr["fy"]),
                cx=float(fr["cx"]), cy=float(fr["cy"]),
                h=fr["depth"].shape[0], w=fr["depth"].shape[1],
            )
        )

    # ---- pass 1: reference normals ----
    ref_normal = jnp.zeros((nvox, 3))
    for p in prepped:
        for s in range(0, nvox, cfg.chunk):
            e = min(s + cfg.chunk, nvox)
            sdf, nrm, ray, ok = _observe(
                centers[s:e], p["depth"], p["normal"], p["validity"],
                p["w2c"], p["cam_pos"], p["fx"], p["fy"], p["cx"], p["cy"],
                p["h"], p["w"], trunc,
            )
            band = ok & (jnp.abs(sdf) <= trunc)
            # weight by how head-on the view is (|n . ray|)
            wgt = jnp.where(band, jnp.abs(jnp.sum(nrm * ray, -1)), 0.0)
            ref_normal = ref_normal.at[s:e].add(wgt[:, None] * nrm)
    ref_normal = ref_normal / jnp.maximum(
        jnp.linalg.norm(ref_normal, axis=-1, keepdims=True), 1e-12
    )

    # ---- pass 2: normal-weighted TSDF ----
    tsdf = vol.tsdf
    weight = vol.weight
    for p in prepped:
        for s in range(0, nvox, cfg.chunk):
            e = min(s + cfg.chunk, nvox)
            sdf, nrm, ray, ok = _observe(
                centers[s:e], p["depth"], p["normal"], p["validity"],
                p["w2c"], p["cam_pos"], p["fx"], p["fy"], p["cx"], p["cy"],
                p["h"], p["w"], trunc,
            )
            agree = jnp.sum(nrm * ref_normal[s:e], -1)
            # back-mask: skip observations whose surface normal opposes
            # the voxel's reference normal (hole avoidance)
            w_obs = jnp.where(ok & (agree > cfg.back_mask_dot),
                              jnp.maximum(agree, 0.0), 0.0)
            obs = jnp.clip(sdf / trunc, -1.0, 1.0)
            w_tot = weight[s:e] + w_obs
            tsdf = tsdf.at[s:e].set(
                jnp.where(
                    w_obs > 0,
                    (tsdf[s:e] * weight[s:e] + obs * w_obs)
                    / jnp.maximum(w_tot, 1e-8),
                    tsdf[s:e],
                )
            )
            weight = weight.at[s:e].set(w_tot)
    return vol._replace(tsdf=tsdf, weight=weight)


def extract(vol: tsdf_lib.TSDFVolume, min_weight: float = 1.0):
    return tsdf_lib.extract_mesh(vol, min_weight)


def make_isofunc(
    frames: List[dict],
    cfg: IsoFusionConfig = IsoFusionConfig(),
    trunc: Optional[float] = None,
):
    """Point-wise two-pass fused-TSDF isoFunc for the adaptive octree
    mesher (mesh/octree.py) — the direct analogue of isooctree_dn.py's
    isoFunc (:460-482): callable (N, 3) world points -> (N,) signed
    values, +1 in unobserved space. Unlike `fuse_normal_weighted` there
    is no dense grid — the octree evaluates only near-surface points."""
    trunc = trunc if trunc is not None else cfg.tsdf_rel * cfg.voxel_size

    prepped = []
    for fr in frames:
        c2w_cv = np.asarray(fr["c2w_gl"]) @ np.diag([1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w_cv).astype(np.float32)
        validity = depth_validity_mask(fr["depth"], cfg.depth_validity_rel)
        prepped.append(
            dict(
                depth=jnp.asarray(fr["depth"][..., 0], jnp.float32),
                normal=jnp.asarray(fr["normal_w"], jnp.float32),
                validity=jnp.asarray(validity),
                w2c=jnp.asarray(w2c),
                cam_pos=jnp.asarray(c2w_cv[:3, 3], jnp.float32),
                fx=float(fr["fx"]), fy=float(fr["fy"]),
                cx=float(fr["cx"]), cy=float(fr["cy"]),
                h=fr["depth"].shape[0], w=fr["depth"].shape[1],
            )
        )

    def eval_fn(points: np.ndarray) -> np.ndarray:
        pts = jnp.asarray(points, jnp.float32)
        n = pts.shape[0]
        ref = jnp.zeros((n, 3))
        for p in prepped:
            sdf, nrm, ray, ok = _observe(
                pts, p["depth"], p["normal"], p["validity"], p["w2c"],
                p["cam_pos"], p["fx"], p["fy"], p["cx"], p["cy"],
                p["h"], p["w"], trunc,
            )
            band = ok & (jnp.abs(sdf) <= trunc)
            wgt = jnp.where(band, jnp.abs(jnp.sum(nrm * ray, -1)), 0.0)
            ref = ref + wgt[:, None] * nrm
        ref = ref / jnp.maximum(
            jnp.linalg.norm(ref, axis=-1, keepdims=True), 1e-12
        )
        acc = jnp.zeros((n,))
        wsum = jnp.zeros((n,))
        for p in prepped:
            sdf, nrm, ray, ok = _observe(
                pts, p["depth"], p["normal"], p["validity"], p["w2c"],
                p["cam_pos"], p["fx"], p["fy"], p["cx"], p["cy"],
                p["h"], p["w"], trunc,
            )
            agree = jnp.sum(nrm * ref, -1)
            w_obs = jnp.where(ok & (agree > cfg.back_mask_dot),
                              jnp.maximum(agree, 0.0), 0.0)
            acc = acc + w_obs * jnp.clip(sdf / trunc, -1.0, 1.0)
            wsum = wsum + w_obs
        fused = jnp.where(wsum >= cfg.min_weight, acc / jnp.maximum(wsum, 1e-8),
                          1.0)
        return np.asarray(fused)

    return eval_fn
