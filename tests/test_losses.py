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


def test_default_lpips_fallback():
    """With no weight npz shipped, rgb_lpips must still be a real number
    (deterministic random-VGG perceptual distance), monotone in
    distortion, and labeled via lpips_kind."""
    from dnsplatter_tpu.eval import metrics as M

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32
    )
    very_noisy = np.clip(img + rng.normal(0, 0.4, img.shape), 0, 1).astype(
        np.float32
    )
    m_same = M.rgb_metrics(jnp.asarray(img), jnp.asarray(img))
    m_noisy = M.rgb_metrics(jnp.asarray(img), jnp.asarray(noisy))
    m_very = M.rgb_metrics(jnp.asarray(img), jnp.asarray(very_noisy))
    assert np.isfinite(m_same["lpips"])
    assert m_same["lpips"] < 1e-6
    assert m_noisy["lpips"] > m_same["lpips"]
    assert m_very["lpips"] > m_noisy["lpips"]
    assert "random-vgg" in M.default_lpips_kind() or \
        M.default_lpips_kind() == "vgg16-lpips"
