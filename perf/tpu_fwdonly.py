"""Forward-stage-only TPU timing (A/B harness for kernel variants)."""
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
from dnsplatter_tpu.ops import rasterize as R

N = 100_000; W, H = 1024, 576
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.5)
cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
viewmat = cam.viewmat()
fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
opac = jax.nn.sigmoid(params.opacities)
feats = jnp.concatenate([jnp.ones((N, 3)) * 0.5, params.normals], -1)
CHUNK = int(os.environ.get("CHUNK", "128"))
cfg = R.RasterizeConfig(width=W, height=H, tile_size=16, chunk=CHUNK,
                        tile_block=16, pair_capacity=1_572_864,
                        backend="pallas")
REPS = 20


def fwd_only(m):
    p = project_gaussians(m, params.quats, jnp.exp(params.scales), viewmat,
                          fx, fy, cx, cy, W, H, opacities=opac)
    allf = jnp.concatenate([feats, p.depths[:, None]], -1)
    img, a = R.rasterize(p.means2d, p.conics, p.depths, opac, allf,
                         p.valid & (alive > 0.5), cfg, radii=p.radii_xy)
    return jnp.sum(img) + jnp.sum(a)


@jax.jit
def step(seed, means):
    def one(c, i):
        return c + fwd_only(means + (seed + i.astype(jnp.float32)) * 1e-9), None
    out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
    return out


out = step(jnp.float32(0), params.means)
float(np.asarray(out))
t0 = time.perf_counter()
outs = [step(jnp.float32(i + 1), params.means) for i in range(3)]
for o in outs:
    float(np.asarray(o))
dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
print(f"fwd chunk={CHUNK}: {dt:.2f} ms/frame", flush=True)
