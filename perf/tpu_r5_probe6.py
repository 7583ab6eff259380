"""Round-5 probe v6: DMA pipeline depth in the chunk-sweep kernels.

probe5 killed the program-overhead theory (multi-tile batching: flat)
and re-attributed the null kernel's ~14 ms to the serial chunk-DMA
wait chain (~0.3 us/visit at depth 2). If that chain is HBM-latency
bound, deeper pipelines (4/8 outstanding chunk DMAs) should collapse
it toward the ~0.4 ms bandwidth floor. Measure on the null skeleton,
then on real forward_tiles variants patched to depth D.
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
payload = jax.random.normal(jax.random.PRNGKey(1), (16, C + 8 * K))


def make_null_depth(depth: int):
    def kernel(starts_ref, counts_ref, payload_hbm, out_ref, pay_vmem, sems):
        t = pl.program_id(0)
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

        def prefetch(i):
            @pl.when(i < nchunks)
            def _():
                dma(i % depth, i).start()

        for i in range(depth):
            prefetch(i)

        def body(ci, acc):
            slot = ci % depth
            dma(slot, ci).wait()
            acc = acc + jnp.sum(pay_vmem[slot][0:1, :], axis=1,
                                keepdims=True)

            @pl.when(ci + depth < nchunks)
            def _():
                dma(slot, ci + depth).start()

            return acc

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((1, 1), jnp.float32)
        )
        out_ref[0] = jnp.broadcast_to(acc, (1, F, P))[0]

    return kernel


for depth in (2, 4, 8):
    kern = make_null_depth(depth)

    def run(seed, payload, starts, counts, kern=kern, depth=depth):
        (out,) = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(T_PAD,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((1, F, P),
                                        lambda t, s1, s2: (t, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((depth, 16, K), jnp.float32),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((T_PAD, F, P), jnp.float32)],
        )(starts[:-1], counts, payload + seed * 0.0)
        return jnp.sum(out[:, 0, 0])

    timed(f"null_depth{depth}", rep(run), payload, starts, counts)

# wider chunks at the same depth: fewer, bigger DMAs (K=256 halves the
# visit count; body cost is what ruled out chunk=256 for the COMPUTE
# kernel, but the DMA chain itself may prefer it — informational)
def make_null_k(depth: int, kk: int):
    def kernel(starts_ref, counts_ref, payload_hbm, out_ref, pay_vmem, sems):
        t = pl.program_id(0)
        start = starts_ref[t]
        cnt = counts_ref[t]
        a0 = pl.multiple_of((start // kk) * kk, kk)
        hoff = start - a0
        nchunks = jnp.where(cnt > 0, pl.cdiv(hoff + cnt, kk), 0)

        def dma(slot, ci):
            return pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(a0 + ci * kk, kk)],
                pay_vmem.at[slot], sems.at[slot],
            )

        def prefetch(i):
            @pl.when(i < nchunks)
            def _():
                dma(i % depth, i).start()

        for i in range(depth):
            prefetch(i)

        def body(ci, acc):
            slot = ci % depth
            dma(slot, ci).wait()
            acc = acc + jnp.sum(pay_vmem[slot][0:1, :], axis=1,
                                keepdims=True)

            @pl.when(ci + depth < nchunks)
            def _():
                dma(slot, ci + depth).start()

            return acc

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((1, 1), jnp.float32)
        )
        out_ref[0] = jnp.broadcast_to(acc, (1, F, P))[0]

    return kernel


for kk in (256, 512):
    kern = make_null_k(4, kk)

    def run(seed, payload, starts, counts, kern=kern, kk=kk):
        (out,) = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(T_PAD,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((1, F, P),
                                        lambda t, s1, s2: (t, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((4, 16, kk), jnp.float32),
                    pltpu.SemaphoreType.DMA((4,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((T_PAD, F, P), jnp.float32)],
        )(starts[:-1], counts, payload + seed * 0.0)
        return jnp.sum(out[:, 0, 0])

    timed(f"null_d4_K{kk}", rep(run), payload, starts, counts)
