"""Headline benchmark: DecayingTurbulence3D, 128^3, Float32, RK44, spectral
pressure solver — the reference's de-facto performance configuration
(examples/DecayingTurbulence3D.jl:15-38; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured against an assumed A100 anchor of 1.0e8
cell-updates/s/chip for this configuration (the reference publishes no
numbers — BASELINE.md documents the absence; this anchor approximates an
optimized CUDA run of the same 4-stage RK + FFT-projection step at 128^3).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.time_steppers.step import timestep, create_stepper

N = 128
NSTEP_WARMUP = 5
NSTEP = 20
BASELINE_CUPS = 1.0e8  # assumed A100-parity anchor (cell-updates/s/chip)


def main():
    dtype = jnp.float32
    lims = (0.0, 2 * np.pi)
    x = tuple(np.linspace(*lims, N + 1) for _ in range(3))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype)
    psolver = ins.psolver_spectral(setup)
    # One jit for the whole initializer: eager dispatch is expensive under
    # remote-compile tunnels
    u0 = jax.jit(lambda key: ins.random_field(setup, kp=10, rng=key))(
        jax.random.PRNGKey(1)
    )

    method = ins.RKMethods.RK44()
    dt = jnp.asarray(1e-3, dtype)

    from functools import partial

    from ins_tpu.ops.fastpath import (
        fastpath_applicable,
        make_fast_timestep,
        strip_ghosts,
    )

    assert fastpath_applicable(setup, method, psolver)
    fast_step = make_fast_timestep(setup, method)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state):
        return fast_step(state, dt, None)

    state = create_stepper(method, setup=setup, psolver=psolver, u=u0)
    state = state._replace(u=jax.jit(strip_ghosts)(state.u))
    for _ in range(NSTEP_WARMUP):
        state = step(state)
    jax.block_until_ready(state.u)

    t0 = time.perf_counter()
    for _ in range(NSTEP):
        state = step(state)
    jax.block_until_ready(state.u)
    elapsed = time.perf_counter() - t0

    assert bool(jnp.all(jnp.isfinite(state.u))), "NaN in benchmark run"

    cells = N**3
    cups = cells * NSTEP / elapsed
    print(
        json.dumps(
            {
                "metric": "DecayingTurbulence3D_128c_rk44_cell_updates_per_s",
                "value": cups,
                "unit": "cell-updates/s/chip",
                "vs_baseline": cups / BASELINE_CUPS,
            }
        )
    )


if __name__ == "__main__":
    main()
