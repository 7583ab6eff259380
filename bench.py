"""Benchmark: rasterize forward+backward throughput (Mpixels/s per chip).

North-star metric from BASELINE.md: Mpixels/s of the differentiable
render (EWA projection + tile binning + single-pass rgb/normal/depth
compositing + hand-derived backward) on one chip. The reference publishes
no numeric tables; vs_baseline is reported against a nominal 75 Mpix/s
fwd+bwd — a mid-range estimate of gsplat 1.0 on the consumer GPUs the
reference targets (README.md:60 gives only qualitative numbers), so >1.0
means faster than the reference stack.

Measurement notes: the TPU in this environment sits behind a high-latency
tunnel whose `block_until_ready` is advisory; iterations are dispatched
without intermediate syncs (they pipeline on the device) and timed around
one final scalar device->host transfer. Compile time is excluded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax

# Persistent compilation cache: the remote TPU compile service in this
# environment is extremely slow (minutes per executable); cached reruns
# are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

NOMINAL_GSPLAT_MPIX_S = 75.0

N_GAUSS = 100_000
WIDTH, HEIGHT = 1024, 576
PAIR_CAPACITY = 1 << 20
INNER_FRAMES = 12  # frames per dispatch (lax.scan)
ITERS = 3  # dispatches


def build(backend: str):
    from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
    from dnsplatter_tpu.ops.projection import project_gaussians
    from dnsplatter_tpu.ops.rasterize import RasterizeConfig, rasterize

    key = jax.random.PRNGKey(0)
    params, alive = make_gt_gaussians(key, N_GAUSS, extent=1.5)
    cam = ring_cameras(1, width=WIDTH, img_height=HEIGHT, focal=700.0)[0]
    cfg = RasterizeConfig(
        width=WIDTH, height=HEIGHT, tile_size=16, chunk=128, tile_block=16,
        pair_capacity=PAIR_CAPACITY, backend=backend,
    )
    viewmat = cam.viewmat()
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx),
                      float(cam.cy))
    opac = jax.nn.sigmoid(params.opacities)
    feats = jnp.concatenate(
        [jnp.ones((N_GAUSS, 3)) * 0.5, params.normals], axis=-1
    )  # rgb + normal channels; depth appended by the caller convention

    @jax.jit
    def step(seed, means, quats, scales, opac, feats, alive, viewmat):
        # INNER_FRAMES full fwd+bwd renders per dispatch: the tunnel's
        # per-dispatch overhead would otherwise dominate the measurement.
        def one(carry, i):
            def loss(means):
                m = means + (seed + i.astype(jnp.float32)) * 1e-9
                proj = project_gaussians(m, quats, scales, viewmat, fx, fy,
                                         cx, cy, WIDTH, HEIGHT)
                allfeats = jnp.concatenate(
                    [feats, proj.depths[:, None]], -1
                )
                img, a = rasterize(
                    proj.means2d, proj.conics, proj.depths, opac,
                    allfeats, proj.valid & (alive > 0.5), cfg,
                    radii=proj.radii,
                )
                return jnp.sum(img) + jnp.sum(a)

            return carry + jax.grad(loss)(means).sum(), None

        out, _ = jax.lax.scan(
            one, jnp.zeros(()), jnp.arange(INNER_FRAMES)
        )
        return out

    args = (params.means, params.quats, jnp.exp(params.scales), opac,
            feats, alive, viewmat)
    return step, args


def main() -> None:
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    try:
        step, args = build(backend)
        out = step(jnp.float32(0), *args)
        float(np.asarray(out))  # force compile + one run
    except Exception:
        backend = "xla"
        step, args = build(backend)
        out = step(jnp.float32(0), *args)
        float(np.asarray(out))

    t0 = time.perf_counter()
    outs = [step(jnp.float32(i + 1), *args) for i in range(ITERS)]
    float(np.asarray(outs[-1]))
    for o in outs:
        float(np.asarray(o))
    dt = time.perf_counter() - t0

    mpix_s = (WIDTH * HEIGHT * ITERS * INNER_FRAMES) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_throughput",
                "value": round(mpix_s, 3),
                "unit": "Mpixels/s",
                "vs_baseline": round(mpix_s / NOMINAL_GSPLAT_MPIX_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
