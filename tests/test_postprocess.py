"""Mesh post-processing: clustering, Laplacian smoothing, QEM decimation
(reference roles: Open3D cluster_connected_triangles /
filter_smooth_laplacian / simplify_quadric_decimation, consumed at
export_mesh.py:681-693, 811-813, 1026-1039)."""

import numpy as np

from dnsplatter_tpu.mesh.marching import marching_tetrahedra
from dnsplatter_tpu.mesh.postprocess import (
    cluster_connected_triangles,
    filter_smooth_laplacian,
    remove_small_clusters,
    simplify_quadric_decimation,
)


def sphere_mesh(res=24, radius=1.0, center=(0.0, 0.0, 0.0)):
    xs = np.linspace(-1.6, 1.6, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    field = np.linalg.norm(g, axis=-1) - radius
    verts, faces = marching_tetrahedra(field.astype(np.float32), 0.0)
    scale = (xs[-1] - xs[0]) / (res - 1)
    verts = xs[0] + verts * scale + np.asarray(center)
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def test_cluster_connected_triangles_two_components():
    v1, f1 = sphere_mesh(res=12)
    v2, f2 = sphere_mesh(res=8, radius=0.5, center=(5.0, 0.0, 0.0))
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    idx, sizes, areas = cluster_connected_triangles(faces, verts)
    assert len(sizes) == 2
    assert sorted(sizes.tolist()) == sorted([len(f1), len(f2)])
    # sphere area ~ 4 pi r^2
    big = areas[np.argmax(sizes)]
    assert abs(big - 4 * np.pi) / (4 * np.pi) < 0.2


def test_remove_small_clusters_keeps_big_drops_small():
    v1, f1 = sphere_mesh(res=16)
    v2, f2 = sphere_mesh(res=6, radius=0.3, center=(4.0, 0.0, 0.0))
    assert len(f2) < 50 <= len(f1)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3))
    nv, nf, nc = remove_small_clusters(verts, faces, colors)
    # only the big sphere's faces survive (min_triangles=50 floor)
    assert len(nf) == len(f1)
    assert len(nv) <= len(v1)
    assert nc.shape == (len(nv), 3)
    assert nf.min() >= 0 and nf.max() < len(nv)


def test_laplacian_smoothing_reduces_noise():
    rng = np.random.default_rng(1)
    verts, faces = sphere_mesh(res=20)
    noisy = verts + rng.normal(scale=0.03, size=verts.shape).astype(
        np.float32
    )

    def radial_std(v):
        return float(np.std(np.linalg.norm(v, axis=1)))

    sm = filter_smooth_laplacian(noisy, faces, number_of_iterations=3)
    assert radial_std(sm) < 0.6 * radial_std(noisy)
    # smoothing moves vertices but keeps the mesh on the sphere scale
    assert abs(np.mean(np.linalg.norm(sm, axis=1)) - 1.0) < 0.15


def test_quadric_decimation_preserves_shape():
    verts, faces = sphere_mesh(res=20)
    target = len(faces) // 4
    dv, df = simplify_quadric_decimation(verts, faces, target)
    assert len(df) <= target
    assert len(df) > 0.3 * target  # not collapsed to nothing
    # valid indexing, no degenerate faces
    assert df.min() >= 0 and df.max() < len(dv)
    assert ((df[:, 0] != df[:, 1]) & (df[:, 1] != df[:, 2])
            & (df[:, 0] != df[:, 2])).all()
    # decimated vertices stay near the unit sphere
    r = np.linalg.norm(dv, axis=1)
    assert float(np.abs(r - 1.0).mean()) < 0.05
    # face areas sum to roughly the sphere area
    cr = np.cross(dv[df[:, 1]] - dv[df[:, 0]], dv[df[:, 2]] - dv[df[:, 0]])
    area = 0.5 * np.linalg.norm(cr, axis=1).sum()
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.25


def test_quadric_decimation_noop_below_target():
    verts, faces = sphere_mesh(res=10)
    dv, df = simplify_quadric_decimation(verts, faces, len(faces) + 10)
    assert len(df) == len(faces)
