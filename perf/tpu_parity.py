"""On-TPU pallas vs xla parity: forward + gradients at a small config."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import jax
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

def run(backend):
    cfg = RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                          tile_block=16, pair_capacity=1 << 17, backend=backend)
    @jax.jit
    def fwd_and_grad(means):
        proj = project_gaussians(means, params.quats, jnp.exp(params.scales),
                                 viewmat, fx, fy, cx, cy, W, H)
        allf = jnp.concatenate([feats, proj.depths[:, None]], -1)
        def loss(m2d, con, op):
            img, a = rasterize(m2d, con, proj.depths, op, allf,
                               proj.valid & (alive > 0.5), cfg, radii=proj.radii)
            r = jnp.sum(img * jnp.cos(img)) + jnp.sum(a * 1.7)
            return r, (img, a)
        (val, (img, a)), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                                    has_aux=True)(
            proj.means2d, proj.conics, opac)
        return img, a, grads
    t0 = time.time()
    out = fwd_and_grad(params.means)
    out = jax.tree.map(lambda x: np.asarray(x), out)
    print(f"{backend}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
    return out

img_p, a_p, g_p = run("pallas")
img_x, a_x, g_x = run("xla")
def cmp(name, a, b, tol):
    d = np.max(np.abs(a - b)); s = np.max(np.abs(b)) + 1e-8
    print(f"{name}: max|d|={d:.3e} rel={d/s:.3e} {'OK' if d/s < tol else 'FAIL'}", flush=True)
    return d / s < tol
ok = cmp("image", img_p, img_x, 1e-3)
ok &= cmp("alpha", a_p, a_x, 1e-3)
for i, nm in enumerate(["g_means2d", "g_conics", "g_opac"]):
    ok &= cmp(nm, g_p[i], g_x[i], 5e-3)
print("PARITY", "PASS" if ok else "FAIL")
