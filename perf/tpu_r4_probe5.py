"""Round-4 probe v5: batched piecewise sorts + gather width, isolated.

Questions (all at C = 5.24M total lanes, N = 1M):
  1. Reduction-sort shape: ONE batched (kp, C/kp) lax.sort along axis -1
     vs the current Python loop of kp separate sorts vs the monolithic
     sort, key + 7 int32 payload rows, kp in {4, 8, 16, 32, 64}.
     XLA sort is superlinear in row length (key+7: 9.5 ms at C/4 vs
     43.8 ms at C, perf/tpu_r4_probe3.py) — batching removes the
     per-piece dispatch and shortens the sorting network.
  2. Binning-sort shape: the same for key + 1 (uint32 key), kp in
     {1, 4, 16, 32} — feasibility bound for row-band piecewise binning
     (bands of tile rows expand independently and their sorted pieces
     concatenate in tile-id order, so the CSR layout is unchanged).
  3. Payload gather width: w6 vs w10 vs w13 materialized via
     optimization_barrier (perf/tpu_gather_probe.py's strided-sum
     consumption let XLA elide the materialization; the barrier forces
     it like the real kernel input does).
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

C = 5_242_880
N = 1_000_000
REPS = 8


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(jnp.sum(out)) if hasattr(out, "shape") else np.asarray(out))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jnp.sum(o)) if hasattr(o, "shape") else np.asarray(o))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms/frame", flush=True)
    return dt


def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer


rng = np.random.default_rng(0)
keys_np = rng.integers(0, N, C).astype(np.int32)
keysd = jnp.asarray(keys_np)
rows7 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, (7, C)), jnp.int32)
ukeys = jnp.asarray(rng.integers(0, 1 << 31, C).astype(np.uint32))
row1 = rows7[0]

# --- 1. reduction-sort shapes (key + 7) ---
def red_mono(seed, keys, rows):
    k = keys + (0 * seed).astype(jnp.int32)
    outs = jax.lax.sort((k,) + tuple(rows[i] for i in range(7)), num_keys=1)
    return sum(jnp.sum(o[::1009]).astype(jnp.float32) for o in outs[1:])

timed("red_sort_mono", rep(red_mono), keysd, rows7)

for kp in (4, 8, 16, 32, 64):
    cp = C // kp

    def red_batch(seed, keys, rows, kp=kp, cp=cp):
        k = (keys + (0 * seed).astype(jnp.int32)).reshape(kp, cp)
        r2 = rows.reshape(7, kp, cp)
        outs = jax.lax.sort(
            (k,) + tuple(r2[i] for i in range(7)), num_keys=1,
            dimension=-1,
        )
        return sum(jnp.sum(o[:, ::1009]).astype(jnp.float32) for o in outs[1:])

    timed(f"red_sort_batch{kp}", rep(red_batch), keysd, rows7)

def red_loop4(seed, keys, rows):
    acc = jnp.zeros(())
    for j in range(4):
        cp = C // 4
        k = jax.lax.dynamic_slice(keys, (j * cp,), (cp,))
        k = k + (0 * seed).astype(jnp.int32)
        sl = jax.lax.dynamic_slice(rows, (0, j * cp), (7, cp))
        outs = jax.lax.sort((k,) + tuple(sl[i] for i in range(7)), num_keys=1)
        acc += sum(jnp.sum(o[::1009]).astype(jnp.float32) for o in outs[1:])
    return acc

timed("red_sort_loop4", rep(red_loop4), keysd, rows7)

# --- 2. binning-sort shapes (ukey + 1) ---
def bin_mono(seed, keys, row):
    k = keys + (0 * seed).astype(jnp.uint32)
    outs = jax.lax.sort((k, row), num_keys=1)
    return jnp.sum(outs[1][::1009]).astype(jnp.float32)

timed("bin_sort_mono", rep(bin_mono), ukeys, row1)

for kp in (4, 16, 32):
    cp = C // kp

    def bin_batch(seed, keys, row, kp=kp, cp=cp):
        k = (keys + (0 * seed).astype(jnp.uint32)).reshape(kp, cp)
        outs = jax.lax.sort((k, row.reshape(kp, cp)), num_keys=1,
                            dimension=-1)
        return jnp.sum(outs[1][:, ::1009]).astype(jnp.float32)

    timed(f"bin_sort_batch{kp}", rep(bin_batch), ukeys, row1)

# --- 3. materialized gather widths ---
table16 = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))
for w in (6, 10, 13):
    def gath(seed, t, idx, w=w):
        rows = t[:, :w][idx]  # (C, w)
        rows = jax.lax.optimization_barrier(rows + seed * 0.0)
        return jnp.sum(rows[::1009, 0])

    timed(f"gather_w{w}_barrier", rep(gath), table16, keysd)
