"""Sort-cost vs payload rows at 5.24M + unsort strategies at 1M (DCE-proof)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

REPS = 8

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(o))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)

def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer

C = 5_242_880
key = jax.random.PRNGKey(0)
rows = np.asarray(jax.random.randint(key, (18, C), 0, 1 << 22))
for nr in (1, 4, 8, 16):
    def body(s, rows, nr=nr):
        k = rows[0] + (0 * s).astype(jnp.int32)
        out = jax.lax.sort((k,) + tuple(rows[1 + i] for i in range(nr)),
                           num_keys=1)
        return sum(o[::9973].sum() for o in out).astype(jnp.float32)
    timed(f"C={C} sort key+{nr}", rep(body), jnp.asarray(rows[:nr + 1]))

N = 1_000_000
k1 = jax.random.PRNGKey(1)
order = jnp.argsort(jax.random.uniform(k1, (N,)))
grads15 = jax.random.normal(k1, (N, 15))
def scatter_unsort(s, order, grads15):
    return jnp.zeros_like(grads15).at[order].set(
        grads15 + s * 1e-9)[::9973].sum()
timed("unsort scatter n15", rep(scatter_unsort), order, grads15)
def sortride(s, order, grads15):
    out = jax.lax.sort((order + (0 * s).astype(jnp.int32),)
                       + tuple(grads15[:, i] for i in range(15)), num_keys=1)
    return sum(o[::9973].sum() for o in out[1:]).astype(jnp.float32)
timed("unsort sortride n15", rep(sortride), order, grads15)
