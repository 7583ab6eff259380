"""Golden tests of rotation / SH / camera math vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnsplatter_tpu.ops import camera as cam
from dnsplatter_tpu.ops import normals as nrm
from dnsplatter_tpu.ops import quat as q
from dnsplatter_tpu.ops import sh


def _np_quat_to_rotmat(quat):
    quat = quat / np.linalg.norm(quat)
    w, x, y, z = quat
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestQuat:
    def test_quat_to_rotmat_matches_numpy(self):
        rng = np.random.default_rng(0)
        quats = rng.normal(size=(64, 4)).astype(np.float32)
        got = np.asarray(q.quat_to_rotmat(jnp.asarray(quats)))
        want = np.stack([_np_quat_to_rotmat(x) for x in quats])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotmat_is_orthonormal(self):
        rng = np.random.default_rng(1)
        quats = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        rots = q.quat_to_rotmat(quats)
        eye = jnp.einsum("nij,nkj->nik", rots, rots)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(rots)), 1.0, atol=1e-5)

    def test_rotmat_quat_roundtrip(self):
        rng = np.random.default_rng(2)
        quats = jnp.asarray(rng.normal(size=(128, 4)).astype(np.float32))
        quats = q.quat_normalize(quats)
        back = q.rotmat_to_quat(q.quat_to_rotmat(quats))
        # quaternion double cover: compare up to sign
        dot = jnp.abs(jnp.sum(quats * back, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_random_quats_unit_norm(self):
        quats = q.random_quats(jax.random.PRNGKey(0), 1000)
        np.testing.assert_allclose(jnp.linalg.norm(quats, axis=-1), 1.0, atol=1e-5)

    def test_rotate_vector_to_vector(self):
        rng = np.random.default_rng(3)
        v1 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        v2 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        rot = q.rotate_vector_to_vector(v1, v2)
        v1n = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        v2n = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
        got = jnp.einsum("nij,nj->ni", rot, v1n)
        np.testing.assert_allclose(got, v2n, atol=1e-5)

    def test_rotate_vector_antiparallel(self):
        v1 = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        v2 = -v1
        rot = q.rotate_vector_to_vector(v1, v2)
        got = jnp.einsum("nij,nj->ni", rot, v1)
        np.testing.assert_allclose(got, v2, atol=1e-5)


class TestSH:
    def test_num_bases(self):
        assert [sh.num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]

    def test_degree0_is_constant(self):
        coeffs = jnp.ones((8, 1, 3)) * 2.0
        dirs = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
        colors = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(colors, 2.0 * sh.C0 + 0.5, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(16, 3)))
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_basis_orthonormality(self):
        # Monte-Carlo integral over the sphere: int Y_i Y_j = delta_ij.
        n = 200_000
        key = jax.random.PRNGKey(42)
        dirs = jax.random.normal(key, (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh.sh_basis(3, dirs)  # (n, 16)
        gram = (basis.T @ basis) * (4.0 * np.pi / n)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_clamp_nonnegative(self):
        coeffs = -10.0 * jnp.ones((4, 1, 3))
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        assert float(jnp.min(sh.eval_sh(0, coeffs, dirs))) == 0.0


class TestCamera:
    def _camera(self):
        c2w = cam.look_at(eye=[0.0, 0.0, 3.0], target=[0.0, 0.0, 0.0])
        return cam.Camera.create(
            fx=100.0, fy=100.0, cx=64.0, cy=48.0, c2w=c2w, width=128, height=96
        )

    def test_viewmat_inverts_c2w(self):
        c = self._camera()
        vm = c.viewmat()
        c2w_cv = np.asarray(c.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
        np.testing.assert_allclose(np.asarray(vm) @ c2w_cv, np.eye(4), atol=1e-5)

    def test_project_backproject_roundtrip(self):
        c = self._camera()
        rng = np.random.default_rng(0)
        depth = jnp.asarray(rng.uniform(1.0, 5.0, size=(96, 128)).astype(np.float32))
        c2w_cv = c.c2w @ cam.GL_TO_CV
        pts = cam.backproject_depth(depth, c.fx, c.fy, c.cx, c.cy, c2w=c2w_cv)
        uvz = cam.project_points(
            pts.reshape(-1, 3), c.fx, c.fy, c.cx, c.cy, c2w=c2w_cv, return_z=True
        )
        grid = cam.pixel_coords(128, 96).reshape(-1, 2)
        np.testing.assert_allclose(uvz[:, :2], grid, atol=1e-3)
        np.testing.assert_allclose(uvz[:, 2], depth.reshape(-1), atol=1e-4)

    def test_center_pixel_projects_to_principal_point(self):
        c = self._camera()
        # A world point straight down the optical axis.
        uv = cam.project_points(
            jnp.array([[0.0, 0.0, 0.0]]),
            c.fx, c.fy, c.cx, c.cy,
            c2w=c.c2w @ cam.GL_TO_CV,
        )
        np.testing.assert_allclose(uv[0], [64.0, 48.0], atol=1e-4)

    def test_euclidean_to_z_depth(self):
        c = self._camera()
        z = jnp.full((96, 128), 2.0)
        c2w_cv = jnp.eye(4)
        pts = cam.backproject_depth(z, c.fx, c.fy, c.cx, c.cy, c2w=c2w_cv)
        euc = jnp.linalg.norm(pts, axis=-1)
        back = cam.euclidean_to_z_depth(euc, c.fx, c.fy, c.cx, c.cy)
        np.testing.assert_allclose(back[..., 0], z, atol=1e-4)


class TestNormals:
    def test_plane_normal(self):
        # A fronto-parallel plane at z=2 -> normals (0, 0, -1) in OpenCV
        # camera frame (cross(right-left, top-bottom) with y down).
        depth = jnp.full((32, 32), 2.0)
        n = nrm.normal_from_depth_image(depth, 50.0, 50.0, 16.0, 16.0)
        interior = n[2:-2, 2:-2]
        np.testing.assert_allclose(
            interior, np.broadcast_to([0.0, 0.0, -1.0], interior.shape), atol=1e-4
        )

    def test_surface_normal_output_range(self):
        depth = jnp.full((16, 16), 1.5)
        out = nrm.surface_normal_output(depth, 20.0, 20.0, 8.0, 8.0)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
        # flipped to (0,0,1) then mapped to (0.5, 0.5, 1.0)
        np.testing.assert_allclose(
            out[4:-4, 4:-4],
            np.broadcast_to([0.5, 0.5, 1.0], out[4:-4, 4:-4].shape),
            atol=1e-4,
        )

    def test_per_gaussian_normals_face_camera(self):
        key = jax.random.PRNGKey(0)
        n = 64
        means = jax.random.normal(key, (n, 3))
        quats = q.random_quats(jax.random.PRNGKey(1), n)
        scales_log = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        cam_pos = jnp.array([0.0, 0.0, 10.0])
        normals = nrm.per_gaussian_normals(scales_log, quats, means, cam_pos)
        np.testing.assert_allclose(jnp.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)
        viewdirs = cam_pos - means
        viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        assert bool(jnp.all(jnp.sum(normals * viewdirs, axis=-1) >= 0.0))


class TestQuatRotate:
    def test_matches_rotmat_matmul(self):
        """quat_rotate (elementwise, no (N,3,3) temporaries) must equal
        quat_to_rotmat @ v — it replaces the matrix form inside the
        train step, where batched 3x3 operands pad ~57x on TPU."""
        from dnsplatter_tpu.ops.quat import quat_rotate, quat_to_rotmat

        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (257, 4))
        v = jax.random.normal(jax.random.PRNGKey(1), (257, 3))
        ref = jnp.einsum("nij,nj->ni", quat_to_rotmat(q), v)
        out = quat_rotate(q, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_camera_cov_components_match_einsum(self):
        """projection's component-wise W (RS)(RS)^T W^T must equal the
        (N,3,3) einsum formulation it replaced (which OOMed the 1M-seed
        train step compile via T(4,128) padding)."""
        from dnsplatter_tpu.ops.projection import (
            _camera_cov_components, quat_scale_to_covar)

        key = jax.random.PRNGKey(2)
        q = jax.random.normal(key, (191, 4))
        s = jnp.exp(jax.random.normal(jax.random.PRNGKey(3), (191, 3)) - 2.0)
        # a rotation-ish camera matrix
        w = np.linalg.qr(np.random.default_rng(0).normal(size=(3, 3)))[0]
        w = jnp.asarray(w.astype(np.float32))
        covar = quat_scale_to_covar(q, s)
        ref = jnp.einsum("ij,njk,lk->nil", w, covar, w)
        c00, c01, c02, c11, c12, c22 = _camera_cov_components(q, s, w)
        for got, want in [(c00, ref[:, 0, 0]), (c01, ref[:, 0, 1]),
                          (c02, ref[:, 0, 2]), (c11, ref[:, 1, 1]),
                          (c12, ref[:, 1, 2]), (c22, ref[:, 2, 2])]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-6)
