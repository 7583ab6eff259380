"""Sort-cost vs payload rows at 1.44M / 5.24M, DCE-proof (ALL rows consumed)."""
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

for C in (1_441_792, 5_242_880):
    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (18, C), 0, 1 << 22)
    for nr in (1, 4, 8, 16):
        def body(s, rows=rows, nr=nr):
            k = rows[0] + (0 * s).astype(jnp.int32)
            out = jax.lax.sort((k,) + tuple(rows[1 + i] for i in range(nr)),
                               num_keys=1)
            return sum(o[::9973].sum() for o in out).astype(jnp.float32)
        timed(f"C={C} sort key+{nr}", rep(body))

# unsort at N=1M: scatter vs sort-ride, all 15 rows consumed
N = 1_000_000
key = jax.random.PRNGKey(1)
order = jnp.argsort(jax.random.uniform(key, (N,)))
grads15 = jax.random.normal(key, (N, 15))
timed("unsort scatter n15", rep(lambda s: jnp.zeros_like(grads15).at[order].set(
    grads15 + s * 1e-9)[::9973].sum()))
def sortride(s):
    out = jax.lax.sort((order + (0 * s).astype(jnp.int32),)
                       + tuple(grads15[:, i] for i in range(15)), num_keys=1)
    return sum(o[::9973].sum() for o in out[1:]).astype(jnp.float32)
timed("unsort sortride n15", rep(sortride))
