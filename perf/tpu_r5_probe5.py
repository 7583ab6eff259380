"""Round-5 probe v5: program-overhead levers.

probe4's null-body kernel put the per-program fixed cost at ~1.2 (100k)
to ~2.2 us (1M) x 2304 tile programs ~= 3-5 ms per kernel launch. Two
cheap levers before committing to kernel surgery:

  null_tb{1,2,4,8} — the null-body DMA skeleton with TB tiles per
      program (grid T/TB, out block (TB, F, P)): how much of the fixed
      cost does batching actually recover?
  bykey blk{256,512,1024} — reduce_segments_bykey program count is
      n_pad/blk (3906 at 1M/blk=256); bigger blocks halve programs at
      identical total compare volume.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dnsplatter_tpu.ops import rasterize_pallas as rp

REPS = 8


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.float32(0), *args)
    float(np.asarray(jnp.sum(out)))
    t0 = time.perf_counter()
    outs = [f(jnp.float32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jnp.sum(o)))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(seed + i.astype(jnp.float32), *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer


# --- synthetic CSR at 1M-bench scale: T_pad tiles, C pairs ---
T_PAD = 2304
C = 5_242_880
K = 128
F = 7
P = 256

key = jax.random.PRNGKey(0)
w = jax.random.uniform(key, (T_PAD,))
counts = (w / jnp.sum(w) * (C - T_PAD)).astype(jnp.int32) + 1
starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(counts).astype(jnp.int32)])
payload = jax.random.normal(jax.random.PRNGKey(1), (16, C + K))


def make_null_tb(tb: int):
    def kernel(starts_ref, counts_ref, payload_hbm, out_ref, pay_vmem, sems):
        g = pl.program_id(0)

        def tile_body(j, _):
            t = g * tb + j
            start = starts_ref[t]
            cnt = counts_ref[t]
            a0 = pl.multiple_of((start // K) * K, K)
            hoff = start - a0
            nchunks = jnp.where(cnt > 0, pl.cdiv(hoff + cnt, K), 0)

            def dma(slot, ci):
                return pltpu.make_async_copy(
                    payload_hbm.at[:, pl.ds(a0 + ci * K, K)],
                    pay_vmem.at[slot], sems.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                dma(0, 0).start()

            def body(ci, acc):
                slot = ci % 2

                @pl.when(ci + 1 < nchunks)
                def _():
                    dma((ci + 1) % 2, ci + 1).start()

                dma(slot, ci).wait()
                return acc + jnp.sum(pay_vmem[slot][0:1, :], axis=1,
                                     keepdims=True)

            acc = jax.lax.fori_loop(
                0, nchunks, body, jnp.zeros((1, 1), jnp.float32)
            )
            out_ref[j] = jnp.broadcast_to(acc, (1, F, P))[0]
            return 0

        jax.lax.fori_loop(0, tb, tile_body, 0)

    return kernel


for tb in (1, 2, 4, 8):
    kern = make_null_tb(tb)

    def run(seed, payload, starts, counts, kern=kern, tb=tb):
        (out,) = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(T_PAD // tb,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((tb, F, P),
                                        lambda t, s1, s2: (t, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((2, 16, K), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((T_PAD, F, P), jnp.float32)],
        )(starts[:-1], counts, payload + seed * 0.0)
        return jnp.sum(out[:, 0, 0])

    timed(f"null_tb{tb}", rep(run), payload, starts, counts)


# --- bykey reduce blk sweep at the compacted 1M length ---
N = 1_000_000
L = 1_343_488  # ~ (0.2 * nwin + T_pad) * 128
kk = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (L,), 0, N))
vals = jax.random.randint(jax.random.PRNGKey(3), (7, L), -2**30, 2**30)
slab = jnp.pad(jnp.concatenate([vals, kk[None, :]], axis=0),
               ((0, 0), (0, 512)))

for blk in (256, 512, 1024):
    n_pad = -(-N // blk) * blk
    qs = jnp.minimum(jnp.arange(n_pad // blk + 1, dtype=jnp.int32) * blk, N)
    coarse = jnp.searchsorted(kk, qs, side="left").astype(jnp.int32)

    def run(seed, slab, coarse, blk=blk):
        out = rp.reduce_segments_bykey(
            (slab + seed.astype(jnp.int32) * 0), coarse, 7, N, blk=blk)
        return jnp.sum(out[0][::97])

    timed(f"bykey blk{blk}", rep(run), slab, coarse)
