"""Reference (oracle) rasterizer: dense, pure-JAX, exact gsplat semantics.

This is the differentiable oracle of SURVEY.md section 7 step 2: it
composites EVERY valid Gaussian over EVERY pixel in strict global depth
order with per-pixel early-termination semantics identical to the CUDA
rasterizer (`rasterize_to_pixels`):

  * alpha = min(0.999, opacity * exp(-sigma)), skipped when < 1/255
  * a pixel is "done" once the would-be next transmittance T*(1-alpha)
    drops to <= 1e-4; the Gaussian that trips the threshold is NOT
    composited (matching the CUDA `break` placement).

It is O(N * H * W) — intended for tests and tiny scenes only. `jax.grad`
differentiates straight through it, giving golden gradients for the Pallas
production kernels (dnsplatter_tpu/ops/rasterize.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dnsplatter_tpu.ops.camera import pixel_coords

ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.999
TRANSMITTANCE_EPS = 1e-4


def rasterize_pixels_ref(
    means2d: jax.Array,
    conics: jax.Array,
    depths: jax.Array,
    opacities: jax.Array,
    features: jax.Array,
    valid: jax.Array,
    width: int,
    height: int,
    radii: jax.Array | None = None,
    tile_size: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Composite screen-space Gaussians over a full image.

    Args:
        means2d: (N, 2), conics: (N, 3), depths: (N,), opacities: (N,)
            (post-sigmoid, post-compensation), features: (N, F) per-Gaussian
            channels (rgb, depth, normals, ...), valid: (N,) bool.
        radii: optional (N,) screen bounding radius. When given, a Gaussian
            only touches pixels whose `tile_size` tile intersects its
            [mean-radius, mean+radius] bbox — the same footprint culling
            gsplat's tile binning performs (its CUDA rasterizer never sees
            a Gaussian outside the tiles it was binned to, even though the
            alpha tail can exceed 1/255 slightly beyond 3 sigma).

    Returns:
        image: (H, W, F) accumulated features (no background),
        alpha: (H, W, 1) final accumulated opacity (1 - T_final).
    """
    n = means2d.shape[0]
    f = features.shape[-1]
    hw = height * width

    # Global depth sort; invalid Gaussians to the back with +inf depth.
    sort_depth = jnp.where(valid, depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    means2d = means2d[order]
    conics = conics[order]
    opacities = jnp.where(valid[order], opacities[order], 0.0)
    features = features[order]
    if radii is None:
        radii_s = jnp.full((n, 2), jnp.inf, means2d.dtype)
    else:
        if radii.ndim == 1:
            radii = jnp.stack([radii, radii], -1)
        radii_s = radii[order]

    pix = pixel_coords(width, height).reshape(hw, 2)
    pix_tile = jnp.floor(pix / tile_size)

    def body(carry, g):
        t, done, out = carry
        mean, conic, opac, feat, radius = g
        d = pix - mean[None, :]
        sigma = (
            0.5 * (conic[0] * d[:, 0] ** 2 + conic[2] * d[:, 1] ** 2)
            + conic[1] * d[:, 0] * d[:, 1]
        )
        alpha = jnp.minimum(MAX_ALPHA, opac * jnp.exp(-sigma))
        tile_lo = jnp.floor((mean - radius) / tile_size)  # (2,) per-axis
        tile_hi = jnp.floor((mean + radius) / tile_size)
        in_fp = jnp.all((pix_tile >= tile_lo) & (pix_tile <= tile_hi), axis=-1)
        hit = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & in_fp
        next_t = t * (1.0 - alpha)
        would_terminate = hit & (next_t <= TRANSMITTANCE_EPS)
        accept = hit & ~done & ~would_terminate
        w = jnp.where(accept, alpha * t, 0.0)
        out = out + w[:, None] * feat[None, :]
        t = jnp.where(accept, next_t, t)
        done = done | (would_terminate & ~done)
        return (t, done, out), None

    t0 = jnp.ones((hw,), means2d.dtype)
    done0 = jnp.zeros((hw,), bool)
    out0 = jnp.zeros((hw, f), means2d.dtype)
    (t_final, _, out), _ = jax.lax.scan(
        body, (t0, done0, out0), (means2d, conics, opacities, features, radii_s)
    )
    image = out.reshape(height, width, f)
    alpha = (1.0 - t_final).reshape(height, width, 1)
    return image, alpha


def render_ref(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    features: jax.Array,
    camera,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    rasterize_mode: str = "classic",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full oracle render: projection + depth channel + compositing.

    `features` are per-Gaussian channels to composite (already
    view-evaluated colors etc. — SH evaluation happens in the model layer).
    Appends the camera z-depth as the last feature channel so callers get
    accumulated depth for free (split it off and divide by alpha for the
    expected-depth "ED" output, like gsplat's RGB+ED mode).

    Returns (image (H,W,F), accum_depth (H,W,1), alpha (H,W,1)).
    """
    from dnsplatter_tpu.ops.projection import project_gaussians

    proj = project_gaussians(
        means,
        quats,
        scales,
        camera.viewmat(),
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        camera.width,
        camera.height,
        eps2d=eps2d,
        near_plane=near_plane,
        far_plane=far_plane,
    )
    opac = opacities
    if rasterize_mode == "antialiased":
        opac = opac * proj.compensations
    feats = jnp.concatenate([features, proj.depths[:, None]], axis=-1)
    img, alpha = rasterize_pixels_ref(
        proj.means2d,
        proj.conics,
        proj.depths,
        opac,
        feats,
        proj.valid,
        camera.width,
        camera.height,
    )
    return img[..., :-1], img[..., -1:], alpha
