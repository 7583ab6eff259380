"""Payload-gather formulations at C=5.24M rows from an (N+1, 16) table.

The fused-table gather is the largest single forward stage at N=1M
(~34 ms/frame). Candidates:
  a. rows = T[idx] then transpose            (current _raster_fwd_pallas)
  b. rows = T[idx], no transpose             (isolate the transpose)
  c. T.T[:, idx] minor-axis take             (gather directly into (16, C))
  d. T13[idx] 13-row table                   (is cost per-row or per-byte?)
  e. T8[idx] 8-row table
  f. 16 separate 1-col takes                 (column-parallel)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

N = 1_000_001
C = 5_242_880
REPS = 8
key = jax.random.PRNGKey(0)
T = jax.random.normal(key, (N, 16), jnp.float32)
Tt = jnp.asarray(np.ascontiguousarray(np.asarray(T).T))
idx = jax.random.randint(jax.random.PRNGKey(1), (C,), 0, N, jnp.int32)
# tile-sorted-ish: ascending runs like the real CSR
idx_runs = jnp.sort(idx.reshape(2048, -1), axis=1).reshape(-1)

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

def chk(x):
    return jnp.sum(x.reshape(-1)[::1997])

timed("a) T[idx].T       ", rep(lambda s, i: chk(T[(i + s.astype(jnp.int32) * 0)].T)), idx)
timed("b) T[idx]         ", rep(lambda s, i: chk(T[i])), idx)
timed("c) Tt[:, idx]     ", rep(lambda s, i: chk(jnp.take(Tt, i, axis=1))), idx)
timed("d) T[:, :13][idx] ", rep(lambda s, i: chk(T[:, :13][i])), idx)
timed("e) T[:, :8][idx]  ", rep(lambda s, i: chk(T[:, :8][i])), idx)
timed("f) col-takes      ", rep(lambda s, i: sum(chk(jnp.take(Tt[j], i)) for j in range(16))), idx)
timed("runs) T[idx_runs].T", rep(lambda s, i: chk(T[i].T)), idx_runs)
