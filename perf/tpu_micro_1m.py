"""Primitive costs at the N=1M / C=5.24M scale (drove the round-3 design)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

N = 1_000_000
C = 5_242_880
REPS = 8

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
depths = jax.random.uniform(ks[0], (N,), minval=0.1, maxval=10.0)
table16 = jax.random.normal(ks[1], (N + 1, 16))
pair_gauss = jax.random.randint(ks[2], (C,), 0, N)  # random (pessimistic)
# tile-ascending variant: sorted runs of ~600
runs = 8192  # ~640 pairs per run
pg_sorted = jnp.sort(pair_gauss.reshape(runs, -1), axis=1).reshape(-1)
order = jnp.argsort(depths)
grads15 = jax.random.normal(ks[3], (N, 15))
rows3 = jax.random.randint(ks[4], (3, C), 0, 1 << 22)
rows8 = jax.random.randint(ks[5], (8, C), 0, 1 << 22)

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, 'shape') else x, out)
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)

def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer

timed("argsort_1m", rep(lambda s: jnp.argsort(depths + s * 1e-9)[::4097].sum().astype(jnp.float32)))
timed("gather_n16_by_order", rep(lambda s: (table16[:N] + s * 1e-9)[order][::997].sum()))
timed("gather_3sep_by_order", rep(lambda s: (
    (table16[:N, :2] + s * 1e-9)[order][::997].sum()
    + table16[:N, 2:4][order][::997].sum()
    + table16[:N, 4][order][::997].sum())))
timed("gather_c16_random", rep(lambda s: (table16 + s * 1e-9)[pair_gauss][::997].sum()))
timed("gather_c16_tileruns", rep(lambda s: (table16 + s * 1e-9)[pg_sorted][::997].sum()))
timed("sort_tilekey3_c", rep(lambda s: jax.lax.sort(
    (rows3[0] + (s * 0).astype(jnp.int32), rows3[1], rows3[2]),
    num_keys=1, is_stable=True)[1][::997].sum().astype(jnp.float32)))
timed("sort_key8_c", rep(lambda s: jax.lax.sort(
    tuple(rows8[i] + (0 * s).astype(jnp.int32) for i in range(8)),
    num_keys=1)[1][::997].sum().astype(jnp.float32)))
timed("scatter_unsort_n15", rep(lambda s: jnp.zeros_like(grads15).at[order].set(
    grads15 + s * 1e-9)[::997, 0].sum()))
timed("sortride_unsort_n15", rep(lambda s: jax.lax.sort(
    (order,) + tuple(grads15[:, i] + s * 1e-9 for i in range(15)),
    num_keys=1)[5][::997].sum()))
