"""Camera-pose optimizer exp-map: correctness + gradient safety."""

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models.camera_opt import exp_map_so3xr3, so3_exp


def test_so3_exp_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    vecs = np.concatenate([
        rng.normal(0, 1.0, (32, 3)),
        rng.normal(0, 1e-4, (8, 3)),
        [[0.0, 0.0, 0.0], [np.pi, 0, 0], [0, 0, 9e-9]],
    ]).astype(np.float32)
    got = np.asarray(so3_exp(jnp.asarray(vecs)))
    expect = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_exp_map_gradient_finite_at_zero():
    """The trainer initializes camera tangents at exactly zero; the exp
    map gradient must be finite there (a plain norm-based Rodrigues
    formula yields NaN through jnp.linalg.norm at 0)."""
    g = jax.grad(lambda t: jnp.sum(exp_map_so3xr3(t)))(jnp.zeros(6))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(
        lambda t: jnp.sum(exp_map_so3xr3(t) ** 2)
    )(jnp.full((6,), 1e-9, jnp.float32))
    assert np.isfinite(np.asarray(g2)).all()


def test_exp_map_identity_at_zero():
    m = np.asarray(exp_map_so3xr3(jnp.zeros(6)))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-7)
