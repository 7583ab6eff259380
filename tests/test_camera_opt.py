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


def test_cam_opt_update_schedule_matches_numpy_adam():
    """The in-jit pose optimizer accumulates gradients for
    accum_camera_opt steps, then applies ONE full-array Adam update with
    the exponential lr schedule (reference dn_config.py:22,57-61)."""
    import numpy as np

    from dnsplatter_tpu.train.optim import (
        OptimConfig, cam_opt_update, init_cam_opt,
    )

    oc = OptimConfig(accum_camera_opt=4, max_steps=100)
    n_cams = 3
    state = init_cam_opt(n_cams)
    rng = np.random.default_rng(0)
    grads = rng.normal(size=(9, 6)).astype(np.float32)

    # numpy reference: same semantics as the host-side Adam it replaces
    adj = np.zeros((n_cams, 6), np.float32)
    accum = np.zeros((n_cams, 6), np.float32)
    mu = np.zeros((n_cams, 6), np.float32)
    nu = np.zeros((n_cams, 6), np.float32)
    count = 0
    for step in range(9):
        ci = step % n_cams
        state = cam_opt_update(
            oc, state, jnp.asarray(ci, jnp.int32),
            jnp.asarray(grads[step]), jnp.asarray(step, jnp.int32),
        )
        accum[ci] += grads[step]
        if (step + 1) % oc.accum_camera_opt == 0:
            count += 1
            mu = oc.b1 * mu + (1 - oc.b1) * accum
            nu = oc.b2 * nu + (1 - oc.b2) * accum * accum
            mhat = mu / (1 - oc.b1 ** count)
            vhat = nu / (1 - oc.b2 ** count)
            frac = min(step / oc.max_steps, 1.0)
            lr = oc.lr_camera_opt * (
                oc.lr_camera_opt_final / oc.lr_camera_opt
            ) ** frac
            adj = adj - lr * mhat / (np.sqrt(vhat) + oc.eps)
            accum[:] = 0.0

    assert int(state.count) == 2  # steps 3 and 7 applied
    np.testing.assert_allclose(np.asarray(state.adj), adj, rtol=1e-5,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(state.accum), accum, rtol=1e-5,
                               atol=1e-8)
    # the tangents actually moved
    assert float(np.abs(np.asarray(state.adj)).max()) > 0.0
