import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
from dnsplatter_tpu.ops.projection import project_gaussians
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, bin_gaussians

N = 100_000; W, H = 1024, 576
key = jax.random.PRNGKey(0)
params, alive = make_gt_gaussians(key, N, extent=1.5)
cam = ring_cameras(1, width=W, img_height=H, focal=700.0)[0]
opac = jax.nn.sigmoid(params.opacities)
for label, op in [("3sigma", None), ("op-tight", opac)]:
    proj = project_gaussians(params.means, params.quats, jnp.exp(params.scales),
                             cam.viewmat(), float(cam.fx), float(cam.fy),
                             float(cam.cx), float(cam.cy), W, H, opacities=op)
    cfg = RasterizeConfig(width=W, height=H, tile_size=16, chunk=128,
                          pair_capacity=1 << 21)
    b = bin_gaussians(cfg, proj.means2d, proj.depths, proj.radii_xy,
                      (proj.valid & (alive > 0.5)).astype(jnp.float32))
    tot = int(b.total_pairs); al = int(b.starts[-1])
    print(f"{label}: total_pairs={tot} aligned_slots={al} n_valid={int(jnp.sum(proj.valid))}")
