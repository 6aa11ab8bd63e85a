"""Per-kernel timing probe for the fused fast path at a given cube size.

Times each production kernel of the RK44/LMWray3 step in isolation
(msd early/final stage, passB, pressure-correct) plus diagnostic
alternatives (transform-free stage kernel, per-axis rFFT roundtrip) so
step-time regressions can be attributed.  Run:

    python benchmarks/kernel_probe.py [n] [reps]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ins_tpu.ops import dft
from ins_tpu.ops.pallas_kernels import (
    momentum_stage_div_3d,
    momentum_stage_divhat_3d,
    pressure_correct_3d,
    pressure_correct_qhat_3d,
)
from ins_tpu.ops.poisson_pallas import make_fused_projection

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
dtype = jnp.float32
dxs = (2 * np.pi / n,) * 3
visc = 1.0 / 4000.0

proj = make_fused_projection((n, n, n), dxs, dtype)

key = jax.random.PRNGKey(0)
u = jax.random.normal(key, (3, n, n, n), dtype)
ks = [u * (0.9 - 0.1 * i) for i in range(3)]
q = jnp.sum(u, axis=0)


def timeit(tag, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{tag:34s} {ms:8.3f} ms", flush=True)
        return ms
    except Exception as e:  # diagnostic-only variants may not fit
        print(f"{tag:34s} FAILED: {str(e)[:120]}", flush=True)
        return float("nan")


dt = 1e-3


def msd(u, streams, coeffs, **kw):
    return momentum_stage_divhat_3d(
        u, streams, coeffs, visc, dxs, proj["Vinv"], proj["VinvT"], **kw
    )


timeit("msd m=0 (early RK44 stage)", lambda u: msd(u, (u,), (dt,)), u)
timeit(
    "msd m=0 usnew (LMWray3 stage)",
    lambda u: msd(u, (u,), (dt,), emit_k=False, usnew_coeff=dt),
    u,
)
timeit(
    "msd m=3 final (RK44 b-row)",
    lambda u, k0, k1, k2: msd(
        u, (u, k0, k1, k2), (dt / 6, dt / 3, dt / 3, dt / 6), emit_k=False
    ),
    u, *ks,
)
timeit("passB (x-solve)", proj["passB"], q)
timeit(
    "pc_qhat (z/y-inverse + correct)",
    lambda ut, qh: pressure_correct_qhat_3d(
        ut, qh, dxs, proj["V"], proj["VT"]
    ),
    u, q,
)

# ---- diagnostics ----
timeit(
    "msd_notransform m=0 (stage_div)",
    lambda u: momentum_stage_div_3d(u, u, dt, visc, dxs),
    u,
)
timeit("pc plain (no transforms)",
       lambda ut, qq: pressure_correct_3d(ut, qq, dxs), u, q)
timeit(
    "rfftn+irfftn per-axis (scalar)",
    lambda f: dft.irfftn(dft.rfftn(f, axes=(0, 1, 2)), (n, n, n),
                         axes=(0, 1, 2)).real,
    q,
)
