"""Probe: slab depth (bx) for the fused stage kernels at 256^3/512^3.

Ghost-plane re-reads scale as (bx+3)/bx for the msd kernel; VMEM scales
linearly with bx.  Times one fused stage (msd_hat + passB + pc_qhat)
in-graph per bx.

Run: python benchmarks/bx_probe.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ins_tpu.ops.pallas_kernels import (
    momentum_stage_divhat_3d,
    pressure_correct_qhat_3d,
)
from ins_tpu.ops.poisson_pallas import make_fused_projection


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dx = (2 * np.pi / n,) * 3
    visc = 2.5e-4
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, n, n, n), jnp.float32) * 0.1
    proj = make_fused_projection((n,) * 3, dx, jnp.float32)

    for bx in (1, 2, 4, 8):
        if n % bx != 0:
            continue

        def stage(u):
            k, ut, divhat = momentum_stage_divhat_3d(
                u, (u,), (jnp.float32(1e-3),), visc, dx,
                proj["Vinv"], proj["VinvT"], bx=bx,
            )
            qhat = proj["passB"](divhat)
            return pressure_correct_qhat_3d(
                ut, qhat, dx, proj["V"], proj["VT"], bx=bx
            )

        @jax.jit
        def many(u):
            def body(c, _):
                return stage(c), None

            return jax.lax.scan(body, u, None, length=10)[0]

        try:
            y = many(u)
            jax.block_until_ready(y)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                y = many(u)
                jax.block_until_ready(y)
                best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
            print(f"n={n} bx={bx}: {best:7.3f} ms/stage", flush=True)
        except Exception as e:
            print(f"n={n} bx={bx}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
