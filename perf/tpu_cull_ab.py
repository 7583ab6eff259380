"""A/B: exact ellipse-tile culling ON vs OFF at the two bench configs.

VERDICT round-2 asked to re-measure exact_cull now that binning is
~4 ms: the cull shrinks per-tile counts (kernels skip trailing chunks)
at the price of 6 extra expanded f32 rows + the edge-minimizer math +
a searchsorted in binning."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize

W, H = 1024, 576
FRAMES = 48

def run(n, capacity, scale_shift, cull):
    key = jax.random.PRNGKey(0)
    params, alive = make_gt_gaussians(key, n, extent=1.5,
                                      scale_shift=scale_shift)
    cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
    cfg = RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                          tile_block=16, pair_capacity=capacity,
                          backend="pallas", exact_cull=cull)
    viewmat = cam.viewmat()
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx),
                      float(cam.cy))
    opac = jax.nn.sigmoid(params.opacities)
    feats = jnp.concatenate([jnp.ones((n, 3)) * 0.5, params.normals], -1)

    def one_frame(means, seed):
        def loss(means):
            m = means + seed * 1e-9
            proj = project_gaussians(m, params.quats, jnp.exp(params.scales),
                                     viewmat, fx, fy, cx, cy, W, H,
                                     opacities=opac)
            allfeats = jnp.concatenate([feats, proj.depths[:, None]], -1)
            img, a = rasterize(proj.means2d, proj.conics, proj.depths, opac,
                               allfeats, proj.valid & (alive > 0.5), cfg,
                               radii=proj.radii_xy)
            return jnp.sum(img) + jnp.sum(a), None
        (val, _), g = jax.value_and_grad(loss, has_aux=True)(means)
        return g

    @jax.jit
    def step(seed, means):
        def one(carry, i):
            return carry + one_frame(means, seed + i.astype(jnp.float32)).sum(), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(FRAMES))
        return out

    out = step(jnp.float32(0), params.means)
    float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [step(jnp.float32(i + 1), params.means) for i in range(2)]
    for o in outs:
        float(np.asarray(o))
    dt = (time.perf_counter() - t0) / (2 * FRAMES)
    mpix = W * H / dt / 1e6
    print(f"N={n} cull={cull}: {dt*1e3:.2f} ms/frame = {mpix:.2f} Mpix/s",
          flush=True)

for cull in (False, True):
    run(100_000, 1_441_792, 0.0, cull)
for cull in (False, True):
    run(1_000_000, 5_242_880, -0.7675284, cull)
