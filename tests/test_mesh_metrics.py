"""Visibility-culled mesh evaluation: renderer, culling, metrics."""

import numpy as np

from dnsplatter_tpu.data.synthetic import ring_cameras
from dnsplatter_tpu.eval.mesh_metrics import (
    compute_metrics,
    cull_mesh,
    evaluate_mesh,
    sample_surface,
    subdivide_to_edge_length,
)
from dnsplatter_tpu.eval.mesh_render import render_mesh_depth
from dnsplatter_tpu.mesh.marching import marching_tetrahedra


def make_sphere_mesh(r=0.5, n=40):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    c = (n - 1) / 2
    scale = 2.0 * r / (n / 2)
    field = np.sqrt(((g - c) ** 2).sum(0)) - (r / scale)
    v, f = marching_tetrahedra(field, 0.0)
    return ((v - c) * scale).astype(np.float32), f


def test_mesh_depth_render():
    v, f = make_sphere_mesh(r=0.5)
    cam = ring_cameras(1, radius=2.0, height=0.0, width=64, img_height=64,
                       focal=64.0)[0]
    depth = render_mesh_depth(v, f, cam)
    center = depth[32, 32]
    # front surface of a r=0.5 sphere viewed from distance 2
    assert abs(center - 1.5) < 0.08, center
    assert np.isinf(depth[0, 0])  # background


def test_subdivide_and_sample():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    v2, f2 = subdivide_to_edge_length(v, f, max_edge=0.3)
    e = v2[f2]
    lens = np.linalg.norm(e - np.roll(e, 1, axis=1), axis=2)
    assert lens.max() <= 0.3 + 1e-5
    pts, nrm = sample_surface(v2, f2, 500)
    assert pts.shape == (500, 3)
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-5)


def test_cull_mesh_removes_backside():
    v, f = make_sphere_mesh(r=0.5)
    cam = ring_cameras(1, radius=2.0, height=0.0, width=64, img_height=64,
                       focal=64.0)[0]
    v2, f2 = cull_mesh(v, f, [cam], depth_tolerance=0.05)
    # back half culled: face count roughly halves
    assert 0.2 < len(f2) / len(f) < 0.75, (len(f2), len(f))


def test_mesh_metrics_identical_and_offset():
    v, f = make_sphere_mesh(r=0.5)
    m = compute_metrics(v, f, v, f, num_samples=20000)
    # identical surfaces: chamfer ~ inter-sample NN spacing (~0.006 for
    # 20k samples on a r=0.5 sphere), perfect f-score/normals
    assert m["chamfer_l1"] < 0.01
    assert m["fscore"] > 0.99
    assert m["normal_consistency"] > 0.97

    v_off = v + np.array([0.1, 0.0, 0.0], np.float32)
    m2 = compute_metrics(v_off, f, v, f, num_samples=20000)
    assert m2["chamfer_l1"] > m["chamfer_l1"] * 5


def test_evaluate_mesh_end_to_end():
    v, f = make_sphere_mesh(r=0.5, n=28)
    cams = ring_cameras(3, radius=2.0, height=0.0, width=48, img_height=48,
                        focal=48.0)
    m = evaluate_mesh(v, f, v, f, cams, max_edge=0.05, num_samples=10000)
    assert m["fscore"] > 0.99
