"""Adaptive octree isosurface extraction (coarse-to-fine refinement).

Parity target: the IsoOctree C++ library used by the reference's
AGS-Mesh mesher (scripts/isooctree_dn.py:460-482) — an adaptive-octree
isosurfacer driven by a user isoFunc. A dense grid caps resolution far
below room-scale needs (a 512^3 dense grid is 134M samples; the surface
only touches ~1%% of them). This module samples the isoFunc on a coarse
grid, then repeatedly subdivides only the cells that (dilated by one
cell) contain a sign change, evaluating the isoFunc just at the new
corner points. The finest level is meshed with the same 6-tetrahedra
triangulation as mesh/marching.py; because every meshed cell has the
same size and shared corners are evaluated once (global corner
de-duplication), the mesh is crack-free and watertight across cells.

Effective resolution = coarse_res * 2**levels at near-surface memory
cost O(surface area), e.g. 64 * 2^3 = 512^3 effective from a 64^3 sweep.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

# 6-tetrahedra cell decomposition (shared with mesh/marching.py).
from dnsplatter_tpu.mesh.marching import (
    _CORNERS,
    _TET_EDGES,
    _TET_TRIS,
    _TETS,
)


def _pack_coords(coords: np.ndarray) -> np.ndarray:
    """Nonnegative integer (N, 3) coords -> sortable int64 keys
    (21 bits per axis: fine up to 2M cells per side)."""
    c = coords.astype(np.int64)
    return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]


def _eval_corners(
    eval_fn, cells: np.ndarray, step: float, origin: np.ndarray,
    batch: int, known=None,
):
    """isoFunc values at the corners of integer `cells` (scaled by `step`
    from `origin`), evaluating each unique corner once. `known` is an
    optional (sorted_keys, values) cache of corners already evaluated at
    THIS level's coordinate scale (parent corners land on even child
    coords, so each refinement reuses ~a third of its unique corners).
    Returns ((C, 8) values, unique corner coords, unique corner values).
    """
    corners = cells[:, None, :] + _CORNERS[None, :, :]  # (C, 8, 3)
    flat = corners.reshape(-1, 3)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    vals = np.empty(len(uniq), np.float32)
    todo = np.ones(len(uniq), bool)
    if known is not None and len(known[0]) > 0:
        kk, kv = known
        keys = _pack_coords(uniq)
        pos = np.clip(np.searchsorted(kk, keys), 0, len(kk) - 1)
        hit = kk[pos] == keys
        vals[hit] = kv[pos[hit]]
        todo = ~hit
    pts = origin[None, :] + uniq[todo].astype(np.float64) * step
    new_vals = np.empty(len(pts), np.float32)
    for s in range(0, len(pts), batch):
        e = min(s + batch, len(pts))
        new_vals[s:e] = np.asarray(eval_fn(pts[s:e]), np.float32).reshape(-1)
    vals[todo] = new_vals
    return vals[inv].reshape(-1, 8), uniq, vals


def _dilate_cells(cells: np.ndarray, grid_max: np.ndarray) -> np.ndarray:
    """Add the 26-neighbourhood of each cell (clipped to the grid)."""
    offs = np.array(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)], np.int64
    )
    grown = (cells[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    grown = grown[(grown >= 0).all(1) & (grown < grid_max[None, :]).all(1)]
    return np.unique(grown, axis=0)


def _mesh_cells(
    cells: np.ndarray, vals: np.ndarray, step: float, origin: np.ndarray,
    level: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Marching tetrahedra over an arbitrary set of same-size cells.

    Same tables as mesh/marching.py's dense path; vertices are merged by
    their (edge endpoints, interpolation) identity via quantized world
    coordinates, so shared faces between neighbouring cells stitch.
    """
    f = vals - level
    inside = f < 0
    active = inside.any(1) & (~inside).any(1)
    cells = cells[active]
    f = f[active]
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    corner_pos = (cells[:, None, :] + _CORNERS[None, :, :]).astype(
        np.float64
    )  # (C, 8, 3) integer corner coords
    tet_pos = corner_pos[:, _TETS, :]  # (C, 6, 4, 3)
    tet_val = f[:, _TETS]  # (C, 6, 4)

    edges = _TET_EDGES  # local pairs matching _TET_TRIS's edge ids 0..5
    va = tet_val[:, :, edges[:, 0]]  # (C, 6, 6)
    vb = tet_val[:, :, edges[:, 1]]
    pa = tet_pos[:, :, edges[:, 0], :]  # (C, 6, 6, 3)
    pb = tet_pos[:, :, edges[:, 1], :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = va / (va - vb)
    t = np.clip(np.nan_to_num(t, nan=0.5), 0.0, 1.0)
    epts = pa + t[..., None] * (pb - pa)  # (C, 6, 6, 3)

    codes = (
        (tet_val[..., 0] < 0).astype(np.int64)
        | ((tet_val[..., 1] < 0) << 1)
        | ((tet_val[..., 2] < 0) << 2)
        | ((tet_val[..., 3] < 0) << 3)
    )  # (C, 6)

    tris = _TET_TRIS[codes]  # (C, 6, 2, 3) edge ids or -1
    valid_tri = tris[..., 0] >= 0  # (C, 6, 2)
    ci, ti, wi = np.nonzero(valid_tri)
    tri_edges = tris[ci, ti, wi]  # (T, 3)
    tri_pts = epts[ci[:, None], ti[:, None], tri_edges]  # (T, 3, 3)

    all_pts = tri_pts.reshape(-1, 3)
    # merge by quantized position (interp points on shared edges coincide)
    key = np.round(all_pts * 4096.0).astype(np.int64)
    uniq, idx = np.unique(key, axis=0, return_inverse=True)
    order = np.zeros(len(uniq), np.int64)
    order[idx] = np.arange(len(all_pts))
    verts = all_pts[order]
    faces = idx.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]
    verts_world = origin[None, :] + verts * step
    return verts_world.astype(np.float32), faces


def adaptive_isosurface(
    eval_fn: Callable[[np.ndarray], np.ndarray],
    bounds_min: np.ndarray,
    bounds_max: np.ndarray,
    coarse_res: int = 64,
    levels: int = 3,
    level: float = 0.0,
    batch: int = 1 << 16,
    max_cells: int = 4_000_000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of `eval_fn` over an AABB.

    eval_fn: (N, 3) world points -> (N,) signed field values (use +1 for
        unobserved space so empty regions read "outside").
    Returns (vertices (V, 3) world, faces (F, 3) int32).
    """
    bounds_min = np.asarray(bounds_min, np.float64)
    bounds_max = np.asarray(bounds_max, np.float64)
    span = bounds_max - bounds_min
    step = float(np.max(span)) / coarse_res
    grid = np.maximum(np.ceil(span / step).astype(np.int64), 1)

    cx, cy, cz = np.meshgrid(
        np.arange(grid[0]), np.arange(grid[1]), np.arange(grid[2]),
        indexing="ij",
    )
    cells = np.stack([cx, cy, cz], -1).reshape(-1, 3)

    known = None
    for lv in range(levels + 1):
        vals, uniq, uvals = _eval_corners(
            eval_fn, cells, step, bounds_min, batch, known=known
        )
        # cache this level's corners at the CHILD coordinate scale (x2)
        child_keys = _pack_coords(uniq * 2)
        order = np.argsort(child_keys)
        known = (child_keys[order], uvals[order])
        if lv == levels:
            return _mesh_cells(cells, vals, step, bounds_min, level)
        inside = (vals - level) < 0
        active = inside.any(1) & (~inside).any(1)
        act = cells[active]
        if len(act) == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32))
        act = _dilate_cells(act, grid)
        # subdivide: each active cell -> 8 children at half step
        children = (act[:, None, :] * 2 + _CORNERS[None, :, :]).reshape(
            -1, 3
        )
        if len(children) > max_cells:
            # resolution fallback: stop refining rather than blow memory
            return _mesh_cells(cells, vals, step, bounds_min, level)
        cells = children
        grid = grid * 2
        step = step / 2.0
    raise AssertionError("unreachable")
