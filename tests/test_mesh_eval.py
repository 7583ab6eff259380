"""Mesh extraction + evaluation suite on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.data.synthetic import make_synthetic_scene
from dnsplatter_tpu.models.dn_model import ModelConfig


def _scene_state():
    scene = make_synthetic_scene(seed=0, n_gaussians=250, n_cameras=3,
                                 width=48, height=48,
                                 pair_capacity=1 << 13)
    # gt params act as a "trained" model
    return scene, scene.gt_params, scene.gt_alive


def test_marching_tetrahedra_sphere():
    from dnsplatter_tpu.mesh.marching import marching_tetrahedra

    n = 32
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    c = (n - 1) / 2
    field = np.sqrt(((g - c) ** 2).sum(0)) - 10.0
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) > 500 and len(faces) > 1000
    rad = np.linalg.norm(verts - c, axis=1)
    assert abs(rad.mean() - 10.0) < 0.05
    # watertight: every edge shared by exactly 2 faces
    from collections import Counter

    cnt = Counter()
    for f in faces:
        for a, b in ((0, 1), (1, 2), (0, 2)):
            cnt[(min(f[a], f[b]), max(f[a], f[b]))] += 1
    assert set(cnt.values()) == {2}
    # outward orientation
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    ctr = (v0 + v1 + v2) / 3 - c
    assert ((nrm * ctr).sum(1) > 0).mean() > 0.99


def test_tsdf_fusion_and_export(tmp_path):
    from dnsplatter_tpu.mesh.exporters import TSDFExportConfig, export_tsdf

    scene, params, alive = _scene_state()
    out = export_tsdf(
        params, alive, scene, tmp_path,
        cfg=TSDFExportConfig(voxel_size=0.15, sdf_trunc=0.45, depth_max=6.0,
                             min_weight=1.0),
        sh_degree=0,
    )
    assert out.exists()
    from dnsplatter_tpu.data import io

    mesh = io.read_ply(out)
    assert len(mesh["points"]) > 0


def test_export_gaussians_and_marching(tmp_path):
    from dnsplatter_tpu.mesh.exporters import export_gaussians, export_marching

    scene, params, alive = _scene_state()
    p1 = export_gaussians(params, alive, scene, tmp_path)
    assert p1.exists()
    p2 = export_marching(params, alive, scene, tmp_path, resolution=48,
                         level=0.3)
    assert p2.exists()


def test_sugar_density_field():
    from dnsplatter_tpu.models.sugar import (
        get_density, get_sdf, sample_points_in_gaussians,
    )

    scene, params, alive = _scene_state()
    pts, idx = sample_points_in_gaussians(jax.random.PRNGKey(0), params,
                                          alive, 512)
    assert pts.shape == (512, 3)
    dens_at_centers = get_density(params.means[:64], params, alive)
    dens_far = get_density(
        params.means[:64] + jnp.array([50.0, 0.0, 0.0]), params, alive
    )
    # density near centers dominates density far away
    assert float(jnp.median(dens_at_centers)) > 10 * float(jnp.median(dens_far))
    sdf = get_sdf(params.means[:64] + jnp.array([50.0, 0.0, 0.0]),
                  params, alive)
    assert np.isfinite(np.asarray(sdf)).all()


def test_evaluator_metrics():
    from dnsplatter_tpu.eval.evaluator import evaluate

    scene, params, alive = _scene_state()
    agg = evaluate(params, alive, scene, ModelConfig(), sh_degree=0,
                   pair_capacity=1 << 13)
    # rendering the gt gaussians against their own renders: near-perfect
    assert agg["rgb_psnr"] > 35, agg
    assert agg["depth_abs_rel"] < 0.05, agg
    assert agg["num_images"] == 3


def test_metric_formulas():
    from dnsplatter_tpu.eval import metrics as M

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    m = M.rgb_metrics(a, a)
    assert m["psnr"] > 60 and m["ssim"] > 0.999

    d = jnp.asarray(rng.uniform(1.0, 4.0, (32, 32, 1)).astype(np.float32))
    dm = M.depth_metrics(d, d)
    assert dm["abs_rel"] < 1e-6 and dm["a1"] == 1.0

    n = jnp.zeros((8, 8, 3)).at[..., 2].set(1.0)
    nm = M.normal_metrics(n, n)
    assert nm["mae"] < 1e-3

    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pd = M.pd_metrics(pts, pts)
    assert pd["accuracy"] < 1e-6 and pd["completeness"] == 1.0


def test_native_marching_parity():
    """C++ backend produces the same mesh as the numpy path."""
    from dnsplatter_tpu import native
    from dnsplatter_tpu.mesh.marching import marching_tetrahedra

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
    c = (n - 1) / 2
    field = np.sqrt(((g - c) ** 2).sum(0)) - 7.0
    v1, f1 = marching_tetrahedra(field, 0.0, backend="native")
    v2, f2 = marching_tetrahedra(field, 0.0, backend="numpy")
    assert len(v1) == len(v2) and len(f1) == len(f2)
    r1 = np.sort(np.linalg.norm(v1 - c, axis=1))
    r2 = np.sort(np.linalg.norm(v2 - c, axis=1))
    np.testing.assert_allclose(r1, r2, atol=1e-4)


def test_poisson_reconstruction():
    """FFT Poisson solver recovers a sphere from oriented points."""
    from dnsplatter_tpu.mesh.poisson import PoissonConfig, poisson_reconstruct

    rng = np.random.default_rng(0)
    v = rng.normal(size=(5000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    verts, faces = poisson_reconstruct(
        v * 0.5, v, PoissonConfig(resolution=64)
    )
    assert len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.5) < 0.05 and r.std() < 0.05


def test_export_isofusion_adaptive(tmp_path):
    """Adaptive-octree isofusion export end-to-end on a synthetic scene."""
    from dnsplatter_tpu.data.synthetic import make_synthetic_scene
    from dnsplatter_tpu.mesh import exporters as E

    scene = make_synthetic_scene(seed=0, n_gaussians=200, n_cameras=4,
                                 width=48, height=48,
                                 pair_capacity=1 << 12)
    out = E.export_isofusion(
        scene.gt_params, scene.gt_alive, scene, tmp_path,
        sh_degree=0, adaptive=True, coarse_res=24, octree_levels=2,
    )
    assert out.exists()
    from dnsplatter_tpu.data.io import read_ply

    mesh = read_ply(out)
    assert len(mesh["points"]) > 50
    assert len(mesh["faces"]) > 50
    assert np.isfinite(mesh["points"]).all()


def test_render_mesh_depth_large_faces_no_holes():
    """A big close-up quad (un-subdivided, screen extent >> 8 px) must
    fill its whole projection — a fixed tiny per-face window would leave
    inf holes and neuter the visibility cull's occlusion test."""
    import numpy as np

    from dnsplatter_tpu.eval.mesh_render import render_mesh_depth
    from dnsplatter_tpu.ops.camera import Camera

    w = h = 64
    cam = Camera.create(
        fx=80.0, fy=80.0, cx=w / 2, cy=h / 2, width=w, height=h,
        c2w=np.eye(4),
    )
    # OpenGL camera looks down -z: a 4x4 m wall at z=-2 covers the frame
    v = np.array([[-2, -2, -2], [2, -2, -2], [2, 2, -2], [-2, 2, -2]],
                 np.float64)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    z = render_mesh_depth(v, f, cam)
    assert np.isfinite(z).all(), f"{(~np.isfinite(z)).sum()} hole pixels"
    np.testing.assert_allclose(z, 2.0, atol=1e-3)


def test_render_mesh_attributes_interpolates_normals():
    """Barycentric attribute rendering: a tilted plane's rendered vertex
    normals must match the analytic plane normal everywhere it is hit."""
    import numpy as np

    from dnsplatter_tpu.eval.mesh_render import (
        render_mesh_attributes,
        vertex_normals,
    )
    from dnsplatter_tpu.ops.camera import Camera

    w = h = 48
    cam = Camera.create(fx=60.0, fy=60.0, cx=w / 2, cy=h / 2,
                        width=w, height=h, c2w=np.eye(4))
    # plane tilted about x: z = -2 + 0.5 * y (OpenGL cam looks down -z)
    v = np.array([[-2, -2, -3.0], [2, -2, -3.0],
                  [2, 2, -1.0], [-2, 2, -1.0]], np.float64)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    vn = vertex_normals(v, f)
    # all vertex normals equal the plane normal
    expect = vn[0] / np.linalg.norm(vn[0])
    depth, nmap = render_mesh_attributes(v, f, vn, cam)
    hit = np.isfinite(depth)
    assert hit.mean() > 0.9
    nn = nmap[hit]
    nn = nn / np.linalg.norm(nn, axis=-1, keepdims=True)
    err = np.abs(np.abs(nn @ expect) - 1.0)
    assert err.max() < 1e-4, err.max()
    # depth increases with image y (plane slopes away at the bottom in
    # OpenCV pixel coords)
    col = depth[:, w // 2]
    assert col[5] != col[-5]


def test_poisson_cg_solver_matches_fft():
    """The large-grid CG solver (used above 192^3, where the complex64
    FFT footprint is prohibitive) reconstructs the same surface as the
    spectral solve at matched resolution."""
    from dnsplatter_tpu.mesh.poisson import PoissonConfig, poisson_reconstruct

    rng = np.random.default_rng(3)
    n = 20000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts, nrm = v.astype(np.float32), v.astype(np.float32)
    vf, ff = poisson_reconstruct(pts, nrm,
                                 PoissonConfig(resolution=64, solver="fft"))
    vc, fc = poisson_reconstruct(pts, nrm,
                                 PoissonConfig(resolution=64, solver="cg"))
    rf = np.linalg.norm(vf, axis=1)
    rc = np.linalg.norm(vc, axis=1)
    assert abs(rf.mean() - 1.0) < 0.02
    np.testing.assert_allclose(rc.mean(), rf.mean(), atol=2e-3)
    np.testing.assert_allclose(rc.std(), rf.std(), atol=2e-3)
