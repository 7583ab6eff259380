"""Adaptive octree isosurface tests (sphere/analytic-SDF parity)."""

import numpy as np

from dnsplatter_tpu.mesh.octree import adaptive_isosurface


def _sphere_sdf(c, r):
    def f(pts):
        return np.linalg.norm(pts - np.asarray(c)[None, :], axis=1) - r
    return f


def test_sphere_accuracy_matches_effective_resolution():
    """coarse 16 + 3 levels = effective 128: surface error ~ fine step."""
    sdf = _sphere_sdf((0.0, 0.0, 0.0), 0.7)
    v, f = adaptive_isosurface(sdf, [-1, -1, -1], [1, 1, 1],
                               coarse_res=16, levels=3)
    assert len(f) > 1000
    err = np.abs(np.linalg.norm(v, axis=1) - 0.7)
    fine_step = 2.0 / (16 * 2**3)
    assert err.max() < fine_step, (err.max(), fine_step)
    # triangle areas sum to ~ sphere area
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.7**2, rtol=0.05)


def test_adaptive_beats_dense_at_same_sample_budget():
    """The refined mesh resolves detail a dense grid of equal coarse size
    cannot: error shrinks ~8x going from levels=0 to levels=3."""
    sdf = _sphere_sdf((0.05, -0.03, 0.02), 0.6)
    v0, _ = adaptive_isosurface(sdf, [-1, -1, -1], [1, 1, 1],
                                coarse_res=16, levels=0)
    v3, _ = adaptive_isosurface(sdf, [-1, -1, -1], [1, 1, 1],
                                coarse_res=16, levels=3)
    e0 = np.abs(np.linalg.norm(v0 - [0.05, -0.03, 0.02], axis=1) - 0.6).max()
    e3 = np.abs(np.linalg.norm(v3 - [0.05, -0.03, 0.02], axis=1) - 0.6).max()
    assert e3 < e0 / 4.0, (e0, e3)


def test_watertight_edge_sharing():
    """Every interior edge is shared by exactly two faces (crack-free
    across cell boundaries)."""
    sdf = _sphere_sdf((0.0, 0.0, 0.0), 0.55)
    v, f = adaptive_isosurface(sdf, [-1, -1, -1], [1, 1, 1],
                               coarse_res=12, levels=2)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    # closed surface: all edges appear exactly twice
    assert (counts == 2).mean() > 0.99, (counts == 2).mean()


def test_unobserved_space_is_skipped():
    """isoFunc returning +1 (outside) in unobserved regions produces no
    phantom geometry there."""
    def f(pts):
        d = np.linalg.norm(pts, axis=1) - 0.5
        unobserved = pts[:, 0] > 0.8
        return np.where(unobserved, 1.0, d)

    v, faces = adaptive_isosurface(f, [-1, -1, -1], [1, 1, 1],
                                   coarse_res=16, levels=2)
    assert len(faces) > 0
    assert v[:, 0].max() < 0.8 + 0.1
