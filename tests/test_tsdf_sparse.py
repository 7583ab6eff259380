"""Sparse brick-hash TSDF: dense-parity at matched voxel + 1 cm at room
scale (reference fuses rooms at voxel 0.01 in sparse native volumes,
export_mesh.py:839-852, 1001-1017 — the dense JAX grid cannot)."""

import collections

import numpy as np

from dnsplatter_tpu.mesh import tsdf as T
from dnsplatter_tpu.mesh.tsdf_sparse import SparseTSDF, SparseTSDFConfig
from dnsplatter_tpu.ops.camera import Camera, look_at

H = W = 100
FX = FY = 90.0
CX, CY = W / 2, H / 2
R = 2.0


def _sphere_depth(c2w_cv):
    vv, uu = np.mgrid[0:H, 0:W]
    dirs = np.stack([(uu + 0.5 - CX) / FX, (vv + 0.5 - CY) / FY,
                     np.ones_like(uu, np.float64)], -1)
    dw = dirs @ c2w_cv[:3, :3].T
    o = c2w_cv[:3, 3]
    a = (dw * dw).sum(-1)
    b = 2 * (o * dw).sum(-1)
    c = (o * o).sum() - R * R
    t = (-b + np.sqrt(np.maximum(b * b - 4 * a * c, 0))) / (2 * a)
    return t[..., None].astype(np.float32)


def _ring_cameras(n=10):
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = (0.3 * np.cos(ang), 0.1, 0.3 * np.sin(ang))
        tgt = (2.5 * np.cos(ang), 0.0, 2.5 * np.sin(ang))
        cams.append(Camera.create(FX, FY, CX, CY, look_at(eye, tgt), W, H))
    return cams


def test_sparse_matches_dense_at_matched_voxel():
    voxel = 0.05
    sp = SparseTSDF(origin=np.array([-2.5] * 3, np.float32),
                    cfg=SparseTSDFConfig(voxel_size=voxel,
                                         sdf_trunc=3 * voxel))
    vol = T.create_volume([-2.5] * 3, [2.5] * 3,
                          T.TSDFConfig(voxel_size=voxel,
                                       sdf_trunc=3 * voxel))
    for cam in _ring_cameras():
        c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1, -1, 1])
        d = _sphere_depth(c2w_cv)
        rgb = np.full((H, W, 3), 0.5, np.float32)
        sp.integrate(d, rgb, np.asarray(cam.c2w), FX, FY, CX, CY)
        vol = T.integrate(vol, d, rgb, np.asarray(cam.c2w), FX, FY, CX, CY)
    v1, f1, c1 = sp.extract_mesh(min_weight=1.0)
    v2, f2, _ = T.extract_mesh(vol, min_weight=1.0)
    assert len(v1) > 1000 and len(f1) > 1000
    r1 = np.linalg.norm(v1, axis=1)
    r2 = np.linalg.norm(v2, axis=1)
    # same surface: identical radius statistics vs the analytic sphere
    np.testing.assert_allclose(r1.mean(), r2.mean(), atol=1e-3)
    np.testing.assert_allclose(r1.std(), r2.std(), atol=2e-3)
    assert abs(r1.mean() - R) < 2.5 * voxel
    assert c1 is not None and np.all(np.abs(c1 - 0.5) < 1e-3)
    # watertight: every interior edge shared by exactly two faces
    e = collections.Counter()
    for tri in f1[:40000]:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e[(min(tri[a], tri[b]), max(tri[a], tri[b]))] += 1
    counts = collections.Counter(e.values())
    # edges on the 40000-face cut boundary appear once; none >2
    assert set(counts) <= {1, 2}, counts


def test_room_scale_1cm_within_memory():
    """A 10 m room span at voxel 0.01 (dense: 1000^3 = 1e9 voxels) —
    the sparse volume only allocates bricks near the observed wall."""
    voxel = 0.01
    sp = SparseTSDF(origin=np.array([-5.0] * 3, np.float32),
                    cfg=SparseTSDFConfig(voxel_size=voxel, sdf_trunc=0.03,
                                         depth_subsample=2))
    cam = Camera.create(FX, FY, CX, CY,
                        look_at((0.0, 0.0, 0.0), (0.0, 0.0, 3.0)), W, H)
    # planar wall at z = +2 m (OpenCV frame looking down +z)
    c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1, -1, 1])
    vv, uu = np.mgrid[0:H, 0:W]
    depth = np.full((H, W, 1), 2.0, np.float32)
    rgb = np.full((H, W, 3), 0.7, np.float32)
    for _ in range(3):
        sp.integrate(depth, rgb, np.asarray(cam.c2w), FX, FY, CX, CY)
    # memory follows the surface, not the 1000^3 bounding grid
    assert sp.n_slots < 5000, sp.n_slots
    verts, faces, cols = sp.extract_mesh(min_weight=1.0)
    assert len(verts) > 500
    # the reconstructed wall sits at z ~ 2 (camera looks along world dir)
    fwd = c2w_cv[:3, 2]
    o = c2w_cv[:3, 3]
    depth_along = (verts - o) @ fwd
    assert abs(float(np.median(depth_along)) - 2.0) < 0.02
