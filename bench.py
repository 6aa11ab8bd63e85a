"""Headline benchmark: DecayingTurbulence3D, 256^3 (north star per
BASELINE.json) plus 128^3, Float32, RK44, spectral pressure projection —
the reference's de-facto performance configuration
(examples/DecayingTurbulence3D.jl:15-38; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

`vs_baseline` is measured against an assumed A100 anchor of 1.0e8
cell-updates/s/chip (the reference publishes no numbers — BASELINE.md
documents the absence; this anchor approximates an optimized CUDA run of
the same 4-stage RK + FFT-projection step).
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.time_steppers.step import create_stepper

BASELINE_CUPS = 1.0e8  # assumed A100-parity anchor (cell-updates/s/chip)


def run_case(N, nwarm, nstep, method=None, les=False):
    dtype = jnp.float32
    lims = (0.0, 2 * np.pi)
    x = tuple(np.linspace(*lims, N + 1) for _ in range(3))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    kw = {}
    theta = None
    if les:
        # north-star LES config (BASELINE.json configs[3]): Smagorinsky
        # through the fused stage kernels + one fused closure pass/stage
        base = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype)
        kw["closure_model"] = ins.smagorinsky_closure_natural(base)
        theta = jnp.asarray(0.17, dtype)
    setup = ins.Setup(
        x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype, **kw
    )
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda key: ins.random_field(setup, kp=10, rng=key))(
        jax.random.PRNGKey(1)
    )

    if method is None:
        method = ins.RKMethods.RK44()
    dt = jnp.asarray(1e-3 * 128 / N, dtype)

    from ins_tpu.ops.fastpath import (
        fastpath_applicable,
        make_fast_timestep,
        make_fast_timestep_hat,
        strip_ghosts,
    )

    assert fastpath_applicable(setup, method, psolver)
    fast_step = make_fast_timestep(setup, method)
    # Step-boundary merge (hat carry), exactly as solve_unsteady's
    # fixed-dt scan chunks run it; None where the merged chain is off
    # (512^3).
    hat_fns = make_fast_timestep_hat(setup, method)

    # Scan chunks, exactly how solve_unsteady runs the hot loop (one
    # device dispatch per chunk, not per step).
    @partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
    def scan_steps(state, nsteps):
        if hat_fns is not None:
            to_hat, step_hat, from_hat = hat_fns
            h = to_hat(state)

            def hbody(hi, _):
                return step_hat(hi, dt, theta), None

            h, _ = jax.lax.scan(hbody, h, None, length=nsteps)
            return from_hat(h)

        def body(s, _):
            return fast_step(s, dt, theta), None

        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state

    state = create_stepper(method, setup=setup, psolver=psolver, u=u0)
    state = state._replace(u=jax.jit(strip_ghosts)(state.u))
    # Warm with the SAME static length so the timed call reuses the
    # compiled program.
    state = scan_steps(state, nstep)
    jax.block_until_ready(state.u)

    # Best-of-3: one timed sample is vulnerable to one-off axon-tunnel
    # stalls (observed 13.9 vs 19.9 ms/step on identical code).
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = scan_steps(state, nstep)
        jax.block_until_ready(state.u)
        elapsed = min(elapsed, time.perf_counter() - t0)

    assert bool(jnp.all(jnp.isfinite(state.u))), "NaN in benchmark run"
    cups = N**3 * nstep / elapsed
    return cups, elapsed / nstep * 1e3


def main():
    t_start = time.perf_counter()
    # Headline configs first so the JSON line is always backed by them.
    cups128, ms128 = run_case(128, 5, 20)
    cups256, ms256 = run_case(256, 5, 20)
    extra = {
        "ms_per_step_256": ms256,
        "cups_128": cups128,
        "ms_per_step_128": ms128,
        "vs_baseline_128": cups128 / BASELINE_CUPS,
    }

    # Secondary configs (LMWray3 low-storage; 512^3 single chip), each
    # guarded by a wall-clock budget so a fresh-compile run under an
    # external time limit still emits the headline metric.
    budget_s = float(os.environ.get("INS_BENCH_BUDGET_S", 1500))

    def extras_left():
        return time.perf_counter() - t_start < budget_s

    secondary = [
        ("256_les", lambda: run_case(256, 3, 20, les=True)),
        ("256_lmwray3", lambda: run_case(256, 3, 20, method=ins.LMWray3())),
        ("512", lambda: run_case(512, 2, 5)),
        ("512_lmwray3", lambda: run_case(512, 2, 5, method=ins.LMWray3())),
    ]
    for name, fn in secondary:
        if not extras_left():
            extra[f"{name}_skipped"] = "bench time budget exhausted"
            continue
        try:
            cups, ms = fn()
            extra[f"cups_{name}"] = cups
            extra[f"ms_per_step_{name}"] = ms
        except Exception as e:  # never fail the headline metric
            extra[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(
        json.dumps(
            {
                "metric": "DecayingTurbulence3D_256c_rk44_cell_updates_per_s",
                "value": cups256,
                "unit": "cell-updates/s/chip",
                "vs_baseline": cups256 / BASELINE_CUPS,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
