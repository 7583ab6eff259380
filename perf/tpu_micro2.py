"""Microbench: backward reduction chain pieces."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

N = 100_000
C = 1 << 21
T = 2304; K = 128
CT = C + T * (K - 1)
REPS = 30
rng = np.random.default_rng(0)
pair_pos_np = rng.permutation(CT).astype(np.int32)
pair_pos_np[pair_pos_np >= C] = C  # dead sentinels
pair_pos = jnp.asarray(pair_pos_np)
grads = jnp.asarray(rng.normal(size=(16, CT)).astype(np.float32))
counts = rng.integers(8, 24, N)
starts_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
starts_np = np.minimum(starts_np, C - 600)
starts = jnp.asarray(starts_np)

def timed(name, body, *args):
    @jax.jit
    def outer(seed, *a):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *a), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    out = outer(jnp.float32(0), *args); float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [outer(jnp.float32(i+1), *args) for i in range(3)]
    for o in outs: float(np.asarray(o))
    print(f"{name}: {(time.perf_counter()-t0)/(3*REPS)*1e3:.2f} ms", flush=True)

def b_scatter_set(s, pp):
    pp2 = jnp.minimum(pp + (s > 1e9).astype(jnp.int32), C)
    inv = jnp.zeros((C,), jnp.int32).at[pp2].set(
        jnp.arange(CT, dtype=jnp.int32), mode="drop")
    return inv[::997].sum().astype(jnp.float32)
timed("inv: scatter-set (CT->C)", b_scatter_set, pair_pos)

def b_argsort_inv(s, pp):
    pp2 = pp + (s > 1e9).astype(jnp.int32)
    _, slots = jax.lax.sort((pp2, jnp.arange(CT, dtype=jnp.int32)),
                            num_keys=1)
    return slots[::997].sum().astype(jnp.float32)
timed("inv: 2-op sort (CT)", b_argsort_inv, pair_pos)

def b_chain(s, g, pp):
    inv = jnp.zeros((C,), jnp.int32).at[pp].set(
        jnp.arange(CT, dtype=jnp.int32), mode="drop")
    gg = (g + s * 1e-20).T[inv].T
    gg = jnp.pad(gg, ((0, 0), (0, 512)))
    return gg[:, ::997].sum()
timed("chain: scatter+T+gather+T+pad", b_chain, grads, pair_pos)

def b_reduce(s, g):
    from dnsplatter_tpu.ops.rasterize_pallas import reduce_segments
    gg = g[:, :C + 512] + s * 1e-20
    out = reduce_segments(gg, starts, N)
    return out[:, ::97].sum()
timed("reduce_segments kernel", b_reduce, grads)

def b_gather_rows(s, g, pp):
    idx = jnp.minimum(pp[:C], CT - 1)
    gg = (g + s * 1e-20).T[idx]
    return gg[::997].sum()
timed("rowgather (CT,16)[inv]", b_gather_rows, grads, pair_pos)
