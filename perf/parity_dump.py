"""Dump pallas+xla fwd/grad results to npz for cross-platform diffing.

Usage: PLAT=cpu DUMP=/tmp/cpu.npz python perf/parity_dump.py
       DUMP=/tmp/tpu.npz python perf/parity_dump.py   (default platform)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("PLAT"):
    jax.config.update("jax_platforms", os.environ["PLAT"])
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np
from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize

print("backend:", jax.default_backend(), flush=True)
N = 5000; W, H = 256, 256
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.2)
cam = ring_cameras(1, width=W, img_height=H, focal=300.0)[0]
viewmat = cam.viewmat()
fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
opac = jax.nn.sigmoid(params.opacities)
feats = jnp.concatenate([jnp.ones((N, 3)) * 0.5, params.normals], -1)

out = {}
for backend in ("pallas", "xla"):
    cfg = RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                          tile_block=16, pair_capacity=1 << 17,
                          backend=backend)

    @jax.jit
    def fwd_and_grad(means):
        proj = project_gaussians(means, params.quats, jnp.exp(params.scales),
                                 viewmat, fx, fy, cx, cy, W, H)
        allf = jnp.concatenate([feats, proj.depths[:, None]], -1)

        def loss(m2d, con, op):
            img, a = rasterize(m2d, con, proj.depths, op, allf,
                               proj.valid & (alive > 0.5), cfg,
                               radii=proj.radii)
            return jnp.sum(img * jnp.cos(img)) + jnp.sum(a * 1.7), (img, a)

        (val, (img, a)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(
            proj.means2d, proj.conics, opac)
        return img, a, grads

    img, a, g = fwd_and_grad(params.means)
    out[f"{backend}_img"] = np.asarray(img)
    out[f"{backend}_alpha"] = np.asarray(a)
    for i, nm in enumerate(["gm2d", "gcon", "gop"]):
        out[f"{backend}_{nm}"] = np.asarray(g[i])
    print(backend, "done", flush=True)

np.savez(os.environ.get("DUMP", "/tmp/parity_dump.npz"), **out)
print("saved", flush=True)
