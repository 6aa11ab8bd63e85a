"""bf16 stream storage probe (VERDICT-r4 item 5 / ROADMAP item 4).

Measures the merged hat chain at 256^3/512^3 with the velocity-like
streams (ut carry, emitted ustart, b-row accumulator) stored bf16
(`make_fast_timestep_hat(stream_dtype=jnp.bfloat16)`) vs the f32
default, plus the energy-balance fidelity cost: relative deviation of
dE/dt from -2 nu Z (the f32 chain's own deviation is the yardstick;
the golden-trace budget is 2e-3, docs/manual/precision.md).

Timing uses a scanned jit with a readback barrier (axon's
block_until_ready returns early; see stream_probe.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import ins_tpu as ins
from ins_tpu.ops.fastpath import make_fast_timestep_hat, strip_ghosts
from ins_tpu.time_steppers.step import StepperState


def make(n, re=4e3):
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    return ins.Setup(x=x, boundary_conditions=bc, Re=re, dtype=jnp.float32)


def chain(setup, stream_dtype, nsteps, dt):
    fns = make_fast_timestep_hat(
        setup, ins.RKMethods.RK44(), stream_dtype=stream_dtype
    )
    if fns is None:
        # f32 at 512^3: no hat carry (merged chain VMEM-gated off) —
        # time the plain unmerged fused step
        from ins_tpu.ops.fastpath import make_fast_timestep

        step = make_fast_timestep(setup, ins.RKMethods.RK44())

        def ident(s):
            return s

        to_hat, step_hat, from_hat = ident, step, ident
    else:
        to_hat, step_hat, from_hat = fns

    @jax.jit
    def run(u):
        h = to_hat(StepperState(
            u=u, temp=None, t=jnp.float32(0), n=jnp.asarray(0)
        ))

        def body(hi, _):
            return step_hat(hi, jnp.float32(dt), None), None

        h, _ = lax.scan(body, h, None, length=nsteps)
        return from_hat(h).u

    return run


def timeit(run, u0, nsteps):
    u = jax.block_until_ready(run(u0))
    float(jnp.sum(u))  # readback barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        u = run(u0)
        float(jnp.sum(u))
        best = min(best, time.perf_counter() - t0)
    return best / nsteps * 1e3


def energy_balance(setup, u0g, stream_dtype, nsteps=40, dt=5e-4):
    """max_t |dE/dt + 2 nu Z| / |2 nu Z| sampled every step."""
    fns = make_fast_timestep_hat(
        setup, ins.RKMethods.RK44(), stream_dtype=stream_dtype
    )
    to_hat, step_hat, from_hat = fns
    visc = float(1.0 / np.asarray(setup.Re))

    @jax.jit
    def trace(u):
        h = to_hat(StepperState(
            u=u, temp=None, t=jnp.float32(0), n=jnp.asarray(0)
        ))

        def body(hi, _):
            h2 = step_hat(hi, jnp.float32(dt), None)
            uu = from_hat(h2).u
            ug = ins.reghost_interior(uu, setup) if hasattr(
                ins, "reghost_interior") else None
            return h2, jnp.sum(uu.astype(jnp.float32) ** 2)

        _, e = lax.scan(body, h, None, length=nsteps)
        return e

    e = np.asarray(jax.block_until_ready(trace(u0g)))
    # dE/dt via centered differences on the (volume-weighted-equal) sum
    vol = float(np.prod([np.diff(np.asarray(x))[0] for x in setup.grid.x]))
    E = 0.5 * e * vol
    dEdt = (E[2:] - E[:-2]) / (2 * dt)
    # enstrophy from the f32 field is not tracked per step here; instead
    # report the RELATIVE spread between the two chains' dE/dt, plus the
    # decay-consistency of each (dE/dt must be negative, smooth)
    return E, dEdt


if __name__ == "__main__":
    for n in (256, 512):
        setup = make(n)

        ps = ins.psolver_spectral(setup)
        u0 = strip_ghosts(jax.jit(
            lambda k: ins.random_field(setup, kp=10, psolver=ps, rng=k)
        )(jax.random.PRNGKey(0)))
        nsteps = 20 if n == 256 else 10
        ms32 = timeit(chain(setup, None, nsteps, 2e-4), u0, nsteps)
        msbf = timeit(chain(setup, jnp.bfloat16, nsteps, 2e-4), u0, nsteps)
        print("%d^3 RK44 hat: f32 %.2f ms/step, bf16 streams %.2f ms/step "
              "(%.2fx)" % (n, ms32, msbf, ms32 / msbf))

    # fidelity: 128^3, 40 steps; compare energy traces
    setup = make(128, re=2e3)
    ps = ins.psolver_spectral(setup)
    u0 = strip_ghosts(jax.jit(
        lambda k: ins.random_field(setup, kp=5, psolver=ps, rng=k)
    )(jax.random.PRNGKey(1)))
    E32, d32 = energy_balance(setup, u0, None)
    Ebf, dbf = energy_balance(setup, u0, jnp.bfloat16)
    rel_E = float(np.max(np.abs(Ebf - E32) / np.abs(E32)))
    rel_d = float(np.max(np.abs(dbf - d32) / np.maximum(np.abs(d32), 1e-12)))
    mono32 = bool(np.all(np.diff(E32) < 0))
    monobf = bool(np.all(np.diff(Ebf) < 0))
    print("fidelity 128^3 x40 steps: max rel E dev %.3e, max rel dE/dt dev "
          "%.3e, monotone decay f32=%s bf16=%s" % (
              rel_E, rel_d, mono32, monobf))
