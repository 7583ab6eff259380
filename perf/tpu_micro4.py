"""Microbench: sort-based gradient reduction candidate, DCE-proof.

micro3 showed variadic sort (key + 16 f32) at ~4 ms vs 31 ms for the
direct segment_sum — but only one value row was consumed, so XLA may
have dropped the other 15 sort outputs. This consumes every row, and
times the full candidate: sort grads into pre-sort pair order (key =
pair_pos) + the reduce_segments Pallas MXU kernel over contiguous
per-Gaussian ranges.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.ops.rasterize_pallas import reduce_segments

N = 100_000
C = 1_572_864
T = 2304; K = 128
CT = C + T * (K - 1)
TOTAL = 1_410_000  # realistic live-pair count at the bench config
REPS = 20
rng = np.random.default_rng(0)

# per-Gaussian pair counts summing to TOTAL (realistic ~14 mean)
cnt = rng.poisson(TOTAL / N, N).astype(np.int64)
scale = TOTAL / max(cnt.sum(), 1)
cnt = np.maximum((cnt * scale).astype(np.int64), 0)
starts_np = np.zeros(N + 1, np.int64)
starts_np[1:] = np.cumsum(cnt)
total = int(starts_np[-1])
gauss_starts = jnp.asarray(starts_np.astype(np.int32))

# pair_pos: a random permutation of [0,total) scattered over live slots,
# sentinel C elsewhere (mimics the aligned slab's dead/dummy columns).
pp = np.full(CT, C, np.int32)
live_slots = rng.choice(CT, size=total, replace=False)
pp[live_slots] = rng.permutation(total).astype(np.int32)
pair_pos = jnp.asarray(pp)
pair_gauss = jnp.asarray(rng.integers(0, N + 1, CT).astype(np.int32))
grads = jnp.asarray(rng.normal(size=(16, CT)).astype(np.float32))


def timed(name, body, *args):
    @jax.jit
    def outer(seed, *a):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *a), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    out = outer(jnp.float32(0), *args); float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [outer(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(o))
    print(f"{name}: {(time.perf_counter() - t0) / (3 * REPS) * 1e3:.2f} ms",
          flush=True)


def consume(rows):
    return sum(r[::997].sum() for r in rows)


def b_sort_all(s, g, p):
    ops = (p,) + tuple(g[i] + s * 1e-20 for i in range(16))
    out = jax.lax.sort(ops, num_keys=1)
    return consume(out[1:]) + out[0][::997].sum().astype(jnp.float32)
timed("sort key+16xf32 (all consumed)", b_sort_all, grads, pair_pos)


def b_reduce_only(s, g):
    gg = g + s * 1e-20
    red = reduce_segments(gg, gauss_starts, N)
    return red[:, ::97].sum()
timed("reduce_segments kernel alone", b_reduce_only, grads)


def b_full(s, g, p):
    gg = g + s * 1e-20
    ops = (p,) + tuple(gg[i] for i in range(16))
    out = jax.lax.sort(ops, num_keys=1)
    vals = jnp.stack(out[1:], axis=0)  # (16, CT) pre-sort order
    red = reduce_segments(vals, gauss_starts, N)
    return red[:, ::97].sum()
timed("sort + reduce_segments (full)", b_full, grads, pair_pos)


def b_segsum(s, g, pg):
    gg = g.T + s * 1e-20
    return jax.ops.segment_sum(gg, pg, num_segments=N + 1)[::97].sum()
timed("segment_sum f32 (reference)", b_segsum, grads, pair_gauss)
