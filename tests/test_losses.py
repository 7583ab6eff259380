"""Loss-function robustness checks."""

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models.losses import rgb_main_loss, ssim


def test_ssim_bounded_on_near_constant_images():
    """f32 cancellation in blur(x^2) - mu^2 used to push SSIM far above 1
    (negative training loss on near-converged images)."""
    rng = np.random.default_rng(0)
    base = 0.73 * np.ones((64, 64, 3), np.float32)
    a = jnp.asarray(base + rng.normal(0, 1e-4, base.shape).astype(np.float32))
    b = jnp.asarray(base + rng.normal(0, 1e-4, base.shape).astype(np.float32))
    s = float(ssim(a, b))
    assert -1.0 <= s <= 1.0 + 1e-4, s
    loss = float(rgb_main_loss(a, b))
    assert loss >= -1e-4, loss


def test_ssim_identity_and_contrast():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(48, 48, 3)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(ssim(img, 1.0 - img)) < 0.5
