"""ICP registration + MuSHRoom mesh-eval protocol tests."""

import numpy as np

from dnsplatter_tpu.eval.icp import (
    icp, load_icp_json, save_icp_json, transform_points,
)


def _se3(rx, ry, rz, t):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    r = (
        np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    )
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


def _cloud(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    # structured cloud (a noisy box surface) so ICP has geometry to lock to
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3))
    for f in range(6):
        m = face == f
        axis, sign = f // 2, 1.0 if f % 2 == 0 else -1.0
        others = [a for a in range(3) if a != axis]
        pts[m, axis] = sign
        pts[m, others[0]] = uv[m, 0]
        pts[m, others[1]] = uv[m, 1]
    return pts + rng.normal(0, 0.005, (n, 3))


def test_icp_recovers_known_se3():
    target = _cloud()
    gt = _se3(0.06, -0.04, 0.09, np.array([0.08, -0.05, 0.12]))
    source = transform_points(target, np.linalg.inv(gt))
    est, rmse = icp(source, target, max_correspondence_distance=0.5)
    recovered = transform_points(source, est)
    err = np.abs(recovered - target).max()
    assert err < 0.02, (err, rmse)
    # transform itself close to gt
    assert np.abs(est - gt).max() < 0.02, est - gt


def test_icp_point_to_plane():
    target = _cloud()
    # box face normals = the dominant axis of each point
    normals = np.zeros_like(target)
    idx = np.abs(target).argmax(1)
    normals[np.arange(len(target)), idx] = np.sign(
        target[np.arange(len(target)), idx]
    )
    gt = _se3(0.03, 0.05, -0.02, np.array([0.05, 0.03, -0.06]))
    source = transform_points(target, np.linalg.inv(gt))
    est, _ = icp(source, target, method="point_to_plane",
                 target_normals=normals, max_correspondence_distance=0.5)
    err = np.abs(transform_points(source, est) - target).max()
    assert err < 0.03, err


def test_icp_json_roundtrip(tmp_path):
    t = _se3(0.1, 0.2, 0.3, np.array([1.0, 2.0, 3.0]))
    p = tmp_path / "icp_iphone.json"
    save_icp_json(p, t)
    np.testing.assert_allclose(load_icp_json(p), t)


def _box_mesh(center, size):
    c = np.asarray(center, np.float64)
    s = size / 2.0
    v = np.array([
        [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
        [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
    ]) + c
    f = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3],
    ], np.int32)
    return v, f


def test_cut_mesh_footprint():
    """Pred geometry outside the gt 2D footprint is removed; inside kept.
    The gt mesh is subdivided first — footprints come from vertex density
    (real Faro meshes are dense; the reference is vertex-based too)."""
    from dnsplatter_tpu.eval.mesh_metrics import subdivide_to_edge_length
    from dnsplatter_tpu.eval.mesh_mushroom import cut_mesh

    gt_v, gt_f = _box_mesh((0, 0, 0), 2.0)
    gt_v, gt_f = subdivide_to_edge_length(gt_v, gt_f, max_edge=0.05)
    inside_v, inside_f = _box_mesh((0, 0, 0), 1.0)
    outlier_v, outlier_f = _box_mesh((10.0, 0, 0), 1.0)
    pred_v = np.concatenate([inside_v, outlier_v])
    pred_f = np.concatenate([inside_f, outlier_f + 8])
    out_v, out_f = cut_mesh(gt_v, pred_v, pred_f, kernel_size=15)
    assert len(out_v) == 8, len(out_v)  # only the inside box survives
    assert len(out_f) == 12
    assert np.abs(out_v).max() <= 0.51


def test_evaluate_mesh_mushroom_self():
    """Protocol end-to-end on synthetic geometry: a mesh vs a jittered,
    SE(3)-displaced copy of itself, with ICP computed (no shipped json).
    Metrics must come out near-perfect after registration."""
    from dnsplatter_tpu.eval.mesh_mushroom import evaluate_mesh_mushroom
    from dnsplatter_tpu.ops.camera import Camera, look_at

    from dnsplatter_tpu.eval.mesh_metrics import subdivide_to_edge_length

    gt_v, gt_f = _box_mesh((0, 0, 0), 1.6)
    gt_v, gt_f = subdivide_to_edge_length(gt_v, gt_f, max_edge=0.1)
    # gt lives in the "Faro frame": displaced by a known SE(3)
    reg = _se3(0.05, -0.03, 0.08, np.array([0.2, -0.1, 0.15]))
    gt_far = transform_points(gt_v, reg)

    cams = []
    for h in (0.8, -0.6):
        for ang in np.linspace(0, 2 * np.pi, 10, endpoint=False):
            eye = (2.5 * np.cos(ang), h, 2.5 * np.sin(ang))
            cams.append(Camera.create(60.0, 60.0, 32.0, 32.0,
                                      look_at(eye, (0, 0, 0)), 64, 64))

    m = evaluate_mesh_mushroom(
        pred_v=gt_v, pred_f=gt_f, gt_v=gt_far, gt_f=gt_f, cameras=cams,
        num_samples=20_000, max_edge=0.1,
    )
    assert m["acc"] < 0.05, m
    assert m["comp"] < 0.05, m
    assert m["fscore"] > 0.9, m
