"""Microbench: packed-bf16 sort reduction candidate + binning internals.

Follow-up to tpu_micro4 (honest sort with all outputs consumed = 23 ms
for key+16xf32, reduce_segments kernel = 2.5 ms, segment_sum = 31 ms):
how does sort cost scale with payload rows, and does packing the 14
needed f32 grad rows into 7 int32 rows (2x bf16) + reduce_segments beat
the direct segment_sum? Also: where do the ~16 ms of binning go?
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
TOTAL = 1_410_000
REPS = 20
rng = np.random.default_rng(0)

cnt = rng.poisson(TOTAL / N, N).astype(np.int64)
starts_np = np.zeros(N + 1, np.int64)
starts_np[1:] = np.cumsum(cnt)
total = int(starts_np[-1])
gauss_starts = jnp.asarray(starts_np.astype(np.int32))

pp = np.full(CT, C, np.int32)
live_slots = rng.choice(CT, size=total, replace=False)
pp[live_slots] = rng.permutation(total).astype(np.int32)
pair_pos = jnp.asarray(pp)
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
    return sum(r[::997].sum().astype(jnp.float32) for r in rows)


def pack2(a, b):
    """Two f32 rows -> one int32 row of packed bf16 pairs."""
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(ab, jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(bb, jnp.uint16).astype(jnp.uint32)
    return ((hi << 16) | lo).astype(jnp.int32)


def unpack2(w):
    u = w.astype(jnp.uint32)
    a = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32)
    return a, b


def b_sortk(nrows):
    def body(s, g, p):
        ops = (p,) + tuple(g[i] + s * 1e-20 for i in range(nrows))
        out = jax.lax.sort(ops, num_keys=1)
        return consume(out)
    return body

for nrows in (4, 7, 14):
    timed(f"sort key+{nrows}xf32 (honest)", b_sortk(nrows), grads, pair_pos)


def b_sort_packed(s, g, p):
    rows = tuple(pack2(g[2 * i] + s * 1e-20, g[2 * i + 1]) for i in range(7))
    out = jax.lax.sort((p,) + rows, num_keys=1)
    return consume(out)
timed("sort key+7xint32 (packed bf16)", b_sort_packed, grads, pair_pos)


def b_full_packed(s, g, p):
    gg = g + s * 1e-20
    rows = tuple(pack2(gg[2 * i], gg[2 * i + 1]) for i in range(7))
    out = jax.lax.sort((p,) + rows, num_keys=1)
    cols = []
    for r in out[1:]:
        a, b = unpack2(r)
        cols += [a, b]
    cols += [jnp.abs(cols[0]), jnp.abs(cols[1])]  # absx, absy post-sort
    vals = jnp.stack(cols, axis=0)  # (16, CT)
    red = reduce_segments(vals, gauss_starts, N)
    return red[:, ::97].sum()
timed("packed sort + unpack + reduce (full)", b_full_packed, grads, pair_pos)


# --- binning internals at bench scale ---
from dnsplatter_tpu.ops.rasterize import RasterizeConfig, bin_gaussians

cfg = RasterizeConfig(width=1024, height=576, tile_size=16, chunk=128,
                      tile_block=16, pair_capacity=C)
means2d = jnp.asarray(
    np.stack([rng.uniform(0, 1024, N), rng.uniform(0, 576, N)], -1)
    .astype(np.float32))
depths = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
# per-axis radii tuned to give ~TOTAL pairs: E[(rx*2/16+1)*(ry*2/16+1)] ~ 14
radii = jnp.asarray(rng.uniform(8, 40, (N, 2)).astype(np.float32))
validf = jnp.ones((N,), jnp.float32)


def b_bin_full(s, m2d, dep, rad, val):
    b = bin_gaussians(cfg, m2d + s * 1e-20, dep, rad, val)
    return (b.pair_gauss[::997].sum() + b.pair_orig[::997].sum()
            + b.starts[::7].sum() + b.counts[::7].sum()).astype(jnp.float32)
timed("bin_gaussians FULL", b_bin_full, means2d, depths, radii, validf)


def b_bin_argsort(s, m2d, dep, rad, val):
    order = jnp.argsort(jnp.where(val > 0.5, dep + s * 1e-20, jnp.inf))
    return (order[::97].sum()).astype(jnp.float32)
timed("  stage: depth argsort(N)", b_bin_argsort, means2d, depths, radii,
      validf)


def b_bin_corner(s, m2d, dep, rad, val):
    x0 = jnp.clip((m2d[:, 0] - rad[:, 0] + s * 1e-20) / 16, 0, 64).astype(jnp.int32)
    x1 = jnp.clip((m2d[:, 0] + rad[:, 0]) / 16 + 1, 0, 64).astype(jnp.int32)
    y0 = jnp.clip((m2d[:, 1] - rad[:, 1]) / 16, 0, 36).astype(jnp.int32)
    y1 = jnp.clip((m2d[:, 1] + rad[:, 1]) / 16 + 1, 0, 36).astype(jnp.int32)
    gx, gy = 65, 37
    corner_idx = jnp.concatenate(
        [y0 * gx + x0, y0 * gx + x1, y1 * gx + x0, y1 * gx + x1])
    one = jnp.ones((N,), jnp.int32)
    corner_val = jnp.concatenate([one, -one, -one, one])
    grid = jnp.zeros((gy * gx,), jnp.int32).at[corner_idx].add(corner_val)
    c2 = jnp.cumsum(jnp.cumsum(grid.reshape(gy, gx), axis=0), axis=1)
    return c2[::3, ::3].sum().astype(jnp.float32)
timed("  stage: corner scatter+2D cumsum", b_bin_corner, means2d, depths,
      radii, validf)


def b_bin_expand(s, m2d, dep, rad, val):
    offsets = (jnp.arange(N, dtype=jnp.int32) * 14) % C
    vals = jnp.stack([jnp.arange(N, dtype=jnp.int32),
                      offsets, jnp.full((N,), 4, jnp.int32),
                      (offsets + s.astype(jnp.int32)) % 4096], -1)
    diffs = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
    table = jnp.zeros((C, 4), jnp.int32).at[offsets].add(diffs, mode="drop")
    acc = jnp.cumsum(table, axis=0)
    return acc[::997].sum().astype(jnp.float32)
timed("  stage: expansion scatter+(C,4) cumsum", b_bin_expand, means2d,
      depths, radii, validf)


def b_bin_sort(s, m2d, dep, rad, val):
    key = (pair_pos + s.astype(jnp.int32) % 2).astype(jnp.int32)
    qv = pair_pos
    out = jax.lax.sort((key, qv), num_keys=1)
    return (out[0][::997].sum() + out[1][::997].sum()).astype(jnp.float32)
timed("  stage: pair sort key+1 (CT)", b_bin_sort, means2d, depths, radii,
      validf)
