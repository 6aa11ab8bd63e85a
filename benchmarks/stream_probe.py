"""Pure HBM stream microbenchmark: what read+write rate can a slab
kernel actually sustain on this chip?

ROADMAP round-3 claimed the 256^3 step ran at "~93% of the ~0.5 GB/ms
effective stream rate" without a measured ceiling (VERDICT r3 missing
#5: v5e nominal HBM is ~0.82 GB/ms).  This probe measures the real
ceiling three ways, at exactly the shapes the solver kernels use:

  1. xla_copy    — jitted y = x * 1.00001 (XLA's own streaming loop)
  2. pallas_bs   — pallas_call with auto-pipelined BlockSpecs (Mosaic
                   double-buffers the slab windows)
  3. pallas_dma  — hand-rolled ring-window DMA (same structure as the
                   production slab kernels: manual make_async_copy in,
                   BlockSpec out)

Each moves 2 * nbytes (read + write).  Run: python benchmarks/stream_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 30


def _time(fn, x):
    # ONE device dispatch per timed sample (a scanned loop, like the
    # solver's hot loop) AND a scalar READBACK as the completion
    # barrier: through the axon tunnel, block_until_ready was observed
    # to return before the device work ran (4000 GB/ms "measured" at
    # 512^3 — 5000x the physical HBM rate); fetching a value derived
    # from the output is a true barrier.  The ~1 ms readback latency is
    # amortized over REPS steps and subtracted via the empty-loop
    # baseline.
    @jax.jit
    def loop(x):
        y = jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                         length=REPS)[0]
        return y, jnp.ravel(y)[0]

    y, v = loop(x)
    float(v)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y, v = loop(y)
        float(v)  # readback: genuine device-completion barrier
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def xla_copy(x):
    return x * 1.00001


def make_pallas_bs(shape, bx):
    c, n = shape[0], shape[1]

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.00001

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(n // bx,),
            in_specs=[pl.BlockSpec((c, bx, *shape[2:]),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, bx, *shape[2:]),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)

    return run


def make_pallas_dma(shape, bx):
    c, n = shape[0], shape[1]

    def kernel(x_hbm, o_ref, win, sems, *, nslab):
        i = pl.program_id(0)
        slot = i % 2

        def load(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(j * bx, bx)], win.at[s], sems.at[s]
            )

        @pl.when(i == 0)
        def _():
            load(0, 0).start()

        @pl.when(i + 1 < nslab)
        def _():
            load(i + 1, 1 - slot).start()

        load(i, slot).wait()
        o_ref[...] = win[slot] * 1.00001

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(kernel, nslab=n // bx),
            grid=(n // bx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((c, bx, *shape[2:]),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, c, bx, *shape[2:]), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)

    return run


def time_pallas_multirep(shape, bx, dtype, reps=REPS):
    """The clean ceiling measurement: ONE pallas_call whose grid loops
    `reps` full passes over the array (read via ring-DMA windows, write
    via the pipelined output block) — no scan, no carry copies, no
    per-rep dispatch.  This is exactly the production slab kernels'
    memory access structure with zero compute."""
    c, n = shape[0], shape[1]
    nslab = n // bx

    def kernel(x_hbm, o_ref, win, sems):
        g = pl.program_id(0)
        i = g % nslab
        slot = g % 2

        def load(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(j * bx, bx)], win.at[s], sems.at[s]
            )

        @pl.when(g == 0)
        def _():
            load(0, 0).start()

        @pl.when(g + 1 < reps * nslab)
        def _():
            load((g + 1) % nslab, 1 - slot).start()

        load(i, slot).wait()
        o_ref[...] = win[slot] * 1.00001

    @jax.jit
    def run(x):
        y = pl.pallas_call(
            kernel,
            grid=(reps * nslab,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (c, bx, *shape[2:]),
                lambda g: (0, g % nslab, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, c, bx, *shape[2:]), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)
        return y, jnp.ravel(y)[0]

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, shape, jnp.float32).astype(dtype)
    y, v = run(x)
    float(v)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y2, v = run(x)
        float(v)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    key = jax.random.PRNGKey(0)
    for n, dtype in ((256, jnp.float32), (256, jnp.bfloat16),
                     (512, jnp.float32)):
        shape = (3, n, n, n)
        nbytes = 3 * n**3 * jnp.dtype(dtype).itemsize
        x = jax.random.normal(key, shape, jnp.float32).astype(dtype)
        bx = max(1, (64 * 1024 * 1024) // (2 * 3 * n * n * jnp.dtype(dtype).itemsize))
        bx = min(bx, 16 if n >= 512 else 32)
        while n % bx:
            bx -= 1
        rows = [
            ("xla_copy", jax.jit(xla_copy)),
            (f"pallas_bs(bx={bx})", make_pallas_bs(shape, bx)),
            (f"pallas_dma(bx={bx})", make_pallas_dma(shape, bx)),
        ]
        for tag, fn in rows:
            t = _time(fn, x)
            gbms = 2 * nbytes / t / 1e9 / 1e3
            print(f"n={n} {jnp.dtype(dtype).name:9s} {tag:18s} "
                  f"{t*1e3:7.3f} ms  {gbms:6.3f} GB/ms (read+write)")
        # the scan-free multi-rep kernel (one dispatch, reps in-grid):
        # the real ceiling — the scanned variants above pay an XLA carry
        # copy per rep plus a visible per-iteration dispatch gap
        t = time_pallas_multirep(shape, bx, dtype)
        gbms = 2 * nbytes / t / 1e9 / 1e3
        print(f"n={n} {jnp.dtype(dtype).name:9s} "
              f"{'pallas_multirep':18s} {t*1e3:7.3f} ms  "
              f"{gbms:6.3f} GB/ms (read+write)")


if __name__ == "__main__":
    main()
