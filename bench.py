"""Benchmark: rasterize forward+backward throughput (Mpixels/s per chip).

North-star metric from BASELINE.md: Mpixels/s of the differentiable render
(projection + SH + single-pass rgb/normal/depth rasterize + loss backward)
on one chip. The reference publishes no numeric tables; vs_baseline is
reported against a nominal 75 Mpix/s fwd+bwd — a mid-range estimate of
gsplat 1.0 on the consumer GPUs the reference targets (README.md:60 gives
only qualitative numbers), so >1.0 means faster than the reference stack.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NOMINAL_GSPLAT_MPIX_S = 75.0

N_GAUSS = 200_000
WIDTH, HEIGHT = 1280, 720
PAIR_CAPACITY = 1 << 21
ITERS = 20


def main() -> None:
    from dnsplatter_tpu.data.synthetic import make_gt_gaussians, ring_cameras
    from dnsplatter_tpu.models.dn_model import ModelConfig, get_outputs
    from dnsplatter_tpu.ops.rasterize import RasterizeConfig

    key = jax.random.PRNGKey(0)
    params, alive = make_gt_gaussians(key, N_GAUSS, extent=1.5)
    cam = ring_cameras(1, width=WIDTH, img_height=HEIGHT, focal=900.0)[0]
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterizeConfig(
        width=WIDTH, height=HEIGHT, tile_size=16, chunk=128, tile_block=32,
        pair_capacity=PAIR_CAPACITY, backend=backend,
    )
    model_cfg = ModelConfig()
    gt = jnp.zeros((HEIGHT, WIDTH, 3))

    def loss_fn(params):
        outputs, _ = get_outputs(
            params, alive, cam, model_cfg, cfg, sh_degree=1,
            background=jnp.zeros((3,)), training=False,
        )
        return (
            jnp.mean(jnp.abs(outputs["rgb"] - gt))
            + jnp.mean(outputs["depth"])
            + jnp.mean(outputs["normal"])
        )

    step = jax.jit(jax.grad(loss_fn))
    g = step(params)  # compile + warmup
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = step(params)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    mpix_s = (WIDTH * HEIGHT * ITERS) / dt / 1e6
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
