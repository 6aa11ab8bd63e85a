"""Hardware probe: step-boundary-merged (hat-carry) chain vs the plain
merged chain — parity over 5 steps and ms/step at 256^3 for RK44 and
LMWray3.  The hat carry holds (ut, qhat) across scan steps; the final
pressure correction of step s runs as stage 0 of step s+1
(`pcmsd_hat_3d(streams=(RECON, ...))`), saving one full velocity HBM
round-trip per step (RK44: the u read; LMWray3: write AND read)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.time_steppers.step import create_stepper
from ins_tpu.ops.fastpath import (
    make_fast_timestep,
    make_fast_timestep_hat,
    strip_ghosts,
)

N = 256
NSTEP = 20


def setup_case(method):
    lims = (0.0, 2 * np.pi)
    x = tuple(np.linspace(*lims, N + 1) for _ in range(3))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0,
                      dtype=jnp.float32)
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda key: ins.random_field(setup, kp=10, rng=key))(
        jax.random.PRNGKey(1))
    state = create_stepper(method, setup=setup, psolver=psolver, u=u0)
    state = state._replace(u=jax.jit(strip_ghosts)(state.u))
    return setup, state


for mname, method in [("RK44", ins.RKMethods.RK44()),
                      ("LMWray3", ins.LMWray3())]:
    setup, state = setup_case(method)
    dt = jnp.asarray(1e-3 * 128 / N, jnp.float32)
    step = make_fast_timestep(setup, method)
    hat = make_fast_timestep_hat(setup, method)
    assert hat is not None, "hat path not built"
    to_hat, step_hat, from_hat = hat

    @partial(jax.jit, static_argnums=(1,))
    def scan_plain(s, nsteps):
        def body(si, _):
            return step(si, dt, None), None
        s, _ = jax.lax.scan(body, s, None, length=nsteps)
        return s

    @partial(jax.jit, static_argnums=(1,))
    def scan_hat(s, nsteps):
        h = to_hat(s)
        def body(hi, _):
            return step_hat(hi, dt, None), None
        h, _ = jax.lax.scan(body, h, None, length=nsteps)
        return from_hat(h)

    # parity over 5 steps
    s_p = scan_plain(state, 5)
    s_h = scan_hat(state, 5)
    jax.block_until_ready(s_p.u); jax.block_until_ready(s_h.u)
    rel = float(jnp.max(jnp.abs(s_p.u - s_h.u)) / jnp.max(jnp.abs(s_p.u)))
    print(f"{mname}: parity rel diff over 5 steps = {rel:.3e}")
    # The hat chain is the SAME arithmetic reordered across kernel
    # boundaries; measured 0.0 on hardware.  Enforce a tight bound so
    # the probe actually fails if the chains ever diverge.
    assert np.isfinite(rel) and rel <= 1e-6, f"hat-carry parity broken: {rel}"

    # timing
    for name, fn in [("plain", scan_plain), ("hat", scan_hat)]:
        s = fn(state, NSTEP); jax.block_until_ready(s.u)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = fn(state, NSTEP)
            jax.block_until_ready(s.u)
            best = min(best, time.perf_counter() - t0)
        print(f"{mname} {name}: {best / NSTEP * 1e3:.3f} ms/step")
