"""Round-5 probe v2: payload-gather width cliff + kernel-side row-DMA cost.

(a) The r4 probes left a width discrepancy: probe5 measured w6=8.0 /
    w10=38.7 / w13=37.5 ms for barrier-materialized gathers at C=5.24M,
    probe2 measured w8~21 / w16~30. If the fast regime is really
    "row fits one (8,128) sublane tile" (<= 8 f32 rows = 32 B), then a
    payload of 6 f32 geometry rows + 2 int32 rows of bf16-packed
    features (7 feats) gathers in the fast regime and the kernels
    decode in-kernel — potentially -9..-25 ms/frame at N=1M. Measure
    w5..w16 on a fine grid, same consumption (sum of materialized).

(b) VERDICT item 8: kernel-side payload fetch — per-pair row DMAs
    issued from the kernel (gather by CSR ids, overlapped with
    compute). The per-DMA issue cost bounds it: measure ns/DMA for
    52-B row copies at various pipeline depths. If issue >= ~50 ns/row
    the approach loses to XLA's 6.3 ns/row wall — record the clean
    negative.
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

C = 5_242_880
N = 1_000_000
REPS = 8


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(jnp.int32(0), *args)
    float(np.asarray(jnp.sum(out)))
    t0 = time.perf_counter()
    outs = [f(jnp.int32(i + 1), *args) for i in range(3)]
    for o in outs:
        float(np.asarray(jnp.sum(o)))
    dt = (time.perf_counter() - t0) / (3 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def rep(body):
    def outer(seed, *args):
        def one(c, i):
            return c + body(i + seed, *args), None
        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(REPS))
        return out
    return outer


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (C,), 0, N)

# (a) width sweep: materialized row gather (C, w) then a forced consume
for w in (5, 6, 7, 8, 9, 10, 12, 13, 16):
    tbl = jax.random.normal(jax.random.PRNGKey(w), (N + 1, w))

    def body(seed, tbl=tbl):
        rows = tbl[jnp.minimum(idx + seed, N)]  # (C, w) materialized
        return jnp.sum(rows[::1024, 0]) + jnp.sum(rows[1::2048, -1])

    timed(f"gather w{w}", rep(body))

# (a2) the candidate production shape: 6 f32 + 2 int32 in ONE table
tbl8 = jax.random.normal(jax.random.PRNGKey(99), (N + 1, 8))

def body8(seed):
    rows = tbl8[jnp.minimum(idx + seed, N)]
    return jnp.sum(rows[::1024, 0]) + jnp.sum(rows[1::2048, 7])

timed("gather w8 (geom+packedfeat shape)", rep(body8))


# (b) kernel-side row DMAs: copy R rows of 52 B addressed by a
# prefetched index list, D-deep DMA pipeline. Reports ns/row.
def make_rowdma_kernel(rows_per_prog: int, depth: int):
    def kernel(idx_ref, tbl_hbm, out_ref, row_vmem, sems):
        p = pl.program_id(0)
        base = p * rows_per_prog

        def dma(slot, i):
            return pltpu.make_async_copy(
                tbl_hbm.at[idx_ref[base + i]], row_vmem.at[slot],
                sems.at[slot],
            )

        for i in range(min(depth, rows_per_prog)):
            dma(i % depth, i).start()

        def body(i, acc):
            slot = i % depth

            @pl.when(i + depth < rows_per_prog)
            def _():
                dma(slot, i + depth).start()

            dma(slot, i).wait()
            return acc + row_vmem[slot, 0]

        acc = jax.lax.fori_loop(0, rows_per_prog, body,
                                jnp.zeros((), jnp.float32))
        out_ref[0] = jnp.full((8, 128), acc, jnp.float32)

    return kernel


R_TOTAL = 1 << 16  # 65k rows is enough to time issue rate
# Mosaic HBM slices must be 128-lane aligned: row DMAs go per
# 128-lane row (512 B) — still measures the per-DMA issue cost,
# which is what bounds a kernel-side gather.
tbl = jax.random.normal(jax.random.PRNGKey(1), (N, 128))
idx_small = jax.random.randint(jax.random.PRNGKey(2), (R_TOTAL,), 0, N)

for rows_per_prog, depth in ((512, 2), (512, 8), (2048, 8), (2048, 16)):
    nprog = R_TOTAL // rows_per_prog
    kern = make_rowdma_kernel(rows_per_prog, depth)

    def run(seed, kern=kern, nprog=nprog, depth=depth):
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nprog,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((1, 8, 128), lambda p, s: (p, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[
                    pltpu.VMEM((depth, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((nprog, 8, 128), jnp.float32)],
        )((idx_small + seed) % N, tbl)[0]
        return jnp.sum(out)

    def body(seed, run=run):
        return run(seed)

    dt = timed(f"rowdma rpp{rows_per_prog} d{depth}", rep(body))
    print(f"  -> {dt * 1e6 / R_TOTAL:.1f} ns/row "
          f"(XLA gather wall: 6.3)", flush=True)
