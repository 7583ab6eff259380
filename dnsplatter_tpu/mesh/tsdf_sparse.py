"""Sparse brick-hash TSDF fusion at reference resolution (1 cm voxels).

Fills the role of the reference's *sparse* native TSDF backends — Open3D
ScalableTSDFVolume at voxel 0.01 / trunc 0.03 (export_mesh.py:1001-1017)
and vdbfusion's OpenVDB volume (export_mesh.py:839-852). A dense grid
cannot reach that resolution at room scale (a 15 m span is 1500^3 = 3.4e9
voxels); here `brick^3`-voxel bricks are allocated lazily where depth
samples land, so memory follows the observed surface (~#surface-voxels),
not the bounding box.

Design: the brick *hash* (key -> slot) lives on the host (it changes
shape every frame); the voxel payload lives on device as capacity-padded
`(slots, brick^3)` arrays so the per-frame projective update is one
jitted gather -> update -> scatter over the frame's touched bricks
(static shapes via power-of-two padding of the touched list). Extraction
assembles per-brick `(b+1)^3` fields (face/edge/corner voxels fetched
from neighbor bricks, missing neighbors read as unobserved +1) and runs
marching tetrahedra per brick — each cube is owned by exactly one brick,
so the union of the per-brick meshes is the same watertight surface a
dense extraction would produce.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SparseTSDFConfig:
    voxel_size: float = 0.01  # Open3DTSDFFusion defaults (export_mesh.py:939)
    sdf_trunc: float = 0.03
    brick: int = 16
    depth_subsample: int = 1  # stride over depth pixels for allocation
    initial_capacity: int = 4096


_KEY_BASE = np.int64(1) << 21
_KEY_OFF = np.int64(1) << 20


def _pack_keys(b: np.ndarray) -> np.ndarray:
    k = b.astype(np.int64) + _KEY_OFF
    return (k[..., 0] * _KEY_BASE + k[..., 1]) * _KEY_BASE + k[..., 2]


class SparseTSDF:
    """Lazily-allocated brick volume with a running weighted TSDF."""

    def __init__(self, origin, cfg: SparseTSDFConfig = SparseTSDFConfig()):
        self.cfg = cfg
        self.origin = np.asarray(origin, np.float32)
        b3 = cfg.brick ** 3
        cap = cfg.initial_capacity
        self._key2slot: dict = {}
        self.keys_np = np.zeros((cap, 3), np.int32)
        self.keys_dev = jnp.zeros((cap, 3), jnp.int32)
        self.tsdf = jnp.ones((cap, b3), jnp.float32)
        self.weight = jnp.zeros((cap, b3), jnp.float32)
        self.color = jnp.zeros((cap, b3, 3), jnp.float32)
        self.n_slots = 0

    @property
    def capacity(self) -> int:
        return self.tsdf.shape[0]

    def _grow(self, need: int) -> None:
        cap = self.capacity
        new_cap = cap
        while new_cap < need:
            new_cap = int(new_cap * 1.5) + 1
        if new_cap == cap:
            return
        b3 = self.cfg.brick ** 3
        pad = new_cap - cap
        self.keys_np = np.concatenate(
            [self.keys_np, np.zeros((pad, 3), np.int32)])
        self.keys_dev = jnp.concatenate(
            [self.keys_dev, jnp.zeros((pad, 3), jnp.int32)])
        self.tsdf = jnp.concatenate(
            [self.tsdf, jnp.ones((pad, b3), jnp.float32)])
        self.weight = jnp.concatenate(
            [self.weight, jnp.zeros((pad, b3), jnp.float32)])
        self.color = jnp.concatenate(
            [self.color, jnp.zeros((pad, b3, 3), jnp.float32)])

    def _surface_bricks(self, depth, c2w_cv, fx, fy, cx, cy) -> np.ndarray:
        """Brick keys whose voxels can fall in the truncation band of
        this frame's depth samples (per-sample AABB of the +-trunc ball,
        <= 8 brick corners each)."""
        cfg = self.cfg
        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        s = cfg.depth_subsample
        d = d[::s, ::s]
        h, w = d.shape
        vv, uu = np.mgrid[0:h, 0:w]
        uu = uu * s + 0.5
        vv = vv * s + 0.5
        valid = d > 1e-6
        z = d[valid]
        x = (uu[valid] - cx) / fx * z
        y = (vv[valid] - cy) / fy * z
        pts_cam = np.stack([x, y, z], -1)
        p = pts_cam @ np.asarray(c2w_cv[:3, :3]).T + np.asarray(c2w_cv[:3, 3])
        bs = cfg.brick * cfg.voxel_size
        lo = np.floor((p - cfg.sdf_trunc - self.origin) / bs).astype(np.int64)
        hi = np.floor((p + cfg.sdf_trunc - self.origin) / bs).astype(np.int64)
        combos = []
        for m in range(8):
            sel = np.array([(m >> 0) & 1, (m >> 1) & 1, (m >> 2) & 1], bool)
            combos.append(np.where(sel[None, :], hi, lo))
        keys = np.unique(_pack_keys(np.concatenate(combos, 0)))
        return keys

    def _ensure_slots(self, packed_keys: np.ndarray) -> np.ndarray:
        """Allocate bricks for unseen keys; return slot array."""
        slots = np.empty(len(packed_keys), np.int64)
        new_keys = []
        for i, k in enumerate(packed_keys.tolist()):
            s = self._key2slot.get(k)
            if s is None:
                s = self.n_slots + len(new_keys)
                self._key2slot[k] = s
                new_keys.append(k)
            slots[i] = s
        if new_keys:
            need = self.n_slots + len(new_keys)
            self._grow(need)
            nk = np.asarray(new_keys, np.int64)
            kz = (nk % _KEY_BASE) - _KEY_OFF
            ky = ((nk // _KEY_BASE) % _KEY_BASE) - _KEY_OFF
            kx = (nk // (_KEY_BASE * _KEY_BASE)) - _KEY_OFF
            k3 = np.stack([kx, ky, kz], -1).astype(np.int32)
            self.keys_np[self.n_slots:need] = k3
            self.keys_dev = self.keys_dev.at[self.n_slots:need].set(
                jnp.asarray(k3))
            self.n_slots = need
        return slots

    def integrate(self, depth, rgb, c2w_gl, fx, fy, cx, cy) -> None:
        """Fuse one RGB-D frame (same conventions as mesh/tsdf.py)."""
        c2w_cv = np.asarray(c2w_gl, np.float64) @ np.diag(
            [1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w_cv).astype(np.float32)
        keys = self._surface_bricks(depth, c2w_cv, fx, fy, cx, cy)
        if len(keys) == 0:
            return
        slots = self._ensure_slots(keys)
        pad = 1 << int(np.ceil(np.log2(max(len(slots), 1))))
        slots_p = np.full(pad, np.int32(1 << 30), np.int32)  # OOB pad -> scatter drops
        slots_p[: len(slots)] = slots
        self.tsdf, self.weight, self.color = _integrate_bricks(
            self.tsdf, self.weight, self.color, self.keys_dev,
            jnp.asarray(slots_p),
            jnp.asarray(depth, jnp.float32), jnp.asarray(rgb, jnp.float32),
            jnp.asarray(w2c), float(fx), float(fy), float(cx), float(cy),
            jnp.asarray(self.origin), self.cfg.voxel_size,
            self.cfg.sdf_trunc, brick=self.cfg.brick,
        )

    def extract_mesh(self, min_weight: float = 1.0,
                     ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Watertight marching-tetrahedra mesh over all allocated bricks.

        Returns (vertices world (V,3), faces (F,3), colors (V,3))."""
        from dnsplatter_tpu.mesh.marching import (
            filter_faces_to_observed, marching_tetrahedra,
        )

        b = self.cfg.brick
        n = self.n_slots
        if n == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), None)
        tsdf = np.asarray(self.tsdf[:n]).reshape(n, b, b, b)
        wgt = np.asarray(self.weight[:n]).reshape(n, b, b, b)
        cols = np.asarray(self.color[:n]).reshape(n, b, b, b, 3)
        observed = wgt >= min_weight
        field = np.where(observed, tsdf, 1.0).astype(np.float32)
        keys = self.keys_np[:n]

        # (b+1)^3 per-brick fields: +1 voxel fetched from the 7 positive
        # neighbors so every cube is owned by exactly one brick. The
        # observed mask rides along — only fully observed cubes mesh
        # (Open3D ScalableTSDFVolume semantics; avoids the phantom shell
        # at the back of the truncation band).
        f17 = np.ones((n, b + 1, b + 1, b + 1), np.float32)
        f17[:, :b, :b, :b] = field
        o17 = np.zeros((n, b + 1, b + 1, b + 1), bool)
        o17[:, :b, :b, :b] = observed

        def lookup(offset):
            pk = _pack_keys(keys + np.asarray(offset, np.int32))
            return np.asarray(
                [self._key2slot.get(int(k), -1) for k in pk], np.int64)

        for dx, dy, dz in ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
                           (1, 0, 1), (0, 1, 1), (1, 1, 1)):
            ns = lookup((dx, dy, dz))
            sel = ns >= 0
            if not sel.any():
                continue
            sx = slice(0, 1) if dx else slice(0, b)
            sy = slice(0, 1) if dy else slice(0, b)
            sz = slice(0, 1) if dz else slice(0, b)
            tx = slice(b, b + 1) if dx else slice(0, b)
            ty = slice(b, b + 1) if dy else slice(0, b)
            tz = slice(b, b + 1) if dz else slice(0, b)
            dst = (np.nonzero(sel)[0][:, None, None, None],
                   np.arange(b + 1)[tx][None, :, None, None],
                   np.arange(b + 1)[ty][None, None, :, None],
                   np.arange(b + 1)[tz][None, None, None, :])
            f17[dst] = field[ns[sel]][:, sx, sy, sz]
            o17[dst] = observed[ns[sel]][:, sx, sy, sz]

        # Batched extraction: bricks with a sign change are concatenated
        # along x with one UNOBSERVED gap sample between them, so one
        # marching call (native C++ fast path) covers ~2k bricks at a
        # time. The observed-cube filter drops every cell that straddles
        # a gap column (its corners are unobserved), which makes the
        # batched output exactly the union of the per-brick extractions
        # — measured ~50x faster than the per-brick Python loop at room
        # scale (perf/room_tsdf_scale.py: 53k bricks).
        signchange = np.logical_and(
            (f17 < 0).any(axis=(1, 2, 3)), (f17 >= 0).any(axis=(1, 2, 3))
        )
        cand = np.nonzero(signchange)[0]
        all_v, all_f, all_c = [], [], []
        voff = 0
        stride = b + 2  # (b+1) samples + 1 gap sample per brick
        batch = max(1, (1 << 21) // ((b + 1) * (b + 1) * stride))
        for s0 in range(0, len(cand), batch):
            sel = cand[s0:s0 + batch]
            m = len(sel)
            fcat = np.ones((m * stride, b + 1, b + 1), np.float32)
            ocat = np.zeros((m * stride, b + 1, b + 1), bool)
            xs = (np.arange(m) * stride)[:, None] + np.arange(b + 1)[None, :]
            fcat[xs.reshape(-1)] = f17[sel].reshape(-1, b + 1, b + 1)
            ocat[xs.reshape(-1)] = o17[sel].reshape(-1, b + 1, b + 1)
            v, f = marching_tetrahedra(fcat, level=0.0)
            v, f, _ = filter_faces_to_observed(v, f, ocat)
            if len(v) == 0:
                continue
            bi = np.minimum((v[:, 0] // stride).astype(np.int64), m - 1)
            local = v.copy()
            local[:, 0] -= bi * stride
            vi = np.clip(np.round(local).astype(int), 0, b - 1)
            gsel = sel[bi]
            all_c.append(cols[gsel, vi[:, 0], vi[:, 1], vi[:, 2]])
            all_v.append(local + keys[gsel].astype(np.float64) * b)
            all_f.append(f + voff)
            voff += len(v)
        if not all_v:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), None)
        verts = np.concatenate(all_v)
        faces = np.concatenate(all_f).astype(np.int32)
        colors = np.concatenate(all_c)
        # merge exact-duplicate vertices on brick-boundary planes
        # (collision-free row unique on the quantized coordinates)
        keyq = np.round(verts * 1024.0).astype(np.int64)
        _, first, inv = np.unique(keyq, axis=0, return_index=True,
                                  return_inverse=True)
        verts_m = verts[first]
        cols_m = colors[first]
        faces_m = inv[faces].astype(np.int32)
        # drop degenerate faces created by the merge
        ok = ((faces_m[:, 0] != faces_m[:, 1])
              & (faces_m[:, 1] != faces_m[:, 2])
              & (faces_m[:, 0] != faces_m[:, 2]))
        faces_m = faces_m[ok]
        verts_w = self.origin + verts_m * self.cfg.voxel_size
        return verts_w.astype(np.float32), faces_m, cols_m.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("brick",))
def _integrate_bricks(tsdf, weight, color, keys_dev, slots, depth, rgb,
                      w2c, fx, fy, cx, cy, origin, voxel, trunc, brick):
    """Projective TSDF update on the touched brick slots (padding slots
    carry an out-of-bounds sentinel; their scatter writes drop)."""
    b3 = brick ** 3
    h, w = depth.shape[:2]
    sl = jnp.minimum(slots, tsdf.shape[0] - 1)
    live = (slots < (1 << 30))[:, None]
    tb = tsdf[sl]  # (S, b3)
    wb = weight[sl]
    cb = color[sl]
    kb = keys_dev[sl].astype(jnp.float32)  # (S, 3)
    ii = jnp.arange(b3, dtype=jnp.int32)
    off = jnp.stack([ii // (brick * brick), (ii // brick) % brick,
                     ii % brick], -1).astype(jnp.float32)
    centers = (origin[None, None, :]
               + (kb[:, None, :] * brick + off[None, :, :]) * voxel)
    pts = centers.reshape(-1, 3)
    pts_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = pts_cam[:, 2]
    u = pts_cam[:, 0] * fx / jnp.maximum(z, 1e-8) + cx
    v = pts_cam[:, 1] * fy / jnp.maximum(z, 1e-8) + cy
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 1e-6)
    dsamp = depth[vi, ui, 0] if depth.ndim == 3 else depth[vi, ui]
    csamp = rgb[vi, ui]
    sdf = dsamp - z
    update = (in_img & (dsamp > 1e-6) & (sdf >= -trunc)
              & (sdf <= trunc)).reshape(-1, b3) & live
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0).reshape(-1, b3)
    c_obs = csamp.reshape(-1, b3, 3)
    w_new = jnp.where(update, 1.0, 0.0)
    w_tot = wb + w_new
    tb = jnp.where(update,
                   (tb * wb + tsdf_obs * w_new) / jnp.maximum(w_tot, 1e-8),
                   tb)
    cb = jnp.where(update[..., None],
                   (cb * wb[..., None] + c_obs * w_new[..., None])
                   / jnp.maximum(w_tot[..., None], 1e-8), cb)
    wb = jnp.where(update, w_tot, wb)
    return (tsdf.at[slots].set(tb, mode="drop"),
            weight.at[slots].set(wb, mode="drop"),
            color.at[slots].set(cb, mode="drop"))
