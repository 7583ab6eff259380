"""Microbench: candidate gradient reductions at bench scale."""
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
C = 1_572_864
T = 2304; K = 128
CT = C + T * (K - 1)
REPS = 20
rng = np.random.default_rng(0)
pg = jnp.asarray(rng.integers(0, N + 1, CT).astype(np.int32))
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
    outs = [outer(jnp.float32(i+1), *args) for i in range(3)]
    for o in outs: float(np.asarray(o))
    print(f"{name}: {(time.perf_counter()-t0)/(3*REPS)*1e3:.2f} ms", flush=True)

def b_segsum(s, g, p):
    gg = g.T + s * 1e-20
    return jax.ops.segment_sum(gg, p, num_segments=N + 1)[::97].sum()
timed("segment_sum f32 (CT,16)", b_segsum, grads, pg)

def b_varsort(s, g, p):
    ops = (p,) + tuple(g[i] + s * 1e-20 for i in range(16))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1][::997].sum() + out[0][::997].sum().astype(jnp.float32)
timed("variadic sort key+16xf32", b_varsort, grads, pg)

def b_varsort8(s, g, p):
    ops = (p,) + tuple(g[i] + s * 1e-20 for i in range(8))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1][::997].sum() + out[0][::997].sum().astype(jnp.float32)
timed("variadic sort key+8xf32", b_varsort8, grads, pg)

def b_segsum_bf16(s, g, p):
    gg = (g.T + s * 1e-20).astype(jnp.bfloat16)
    return jax.ops.segment_sum(gg, p, num_segments=N + 1)[::97].sum().astype(jnp.float32)
timed("segment_sum bf16", b_segsum_bf16, grads, pg)
