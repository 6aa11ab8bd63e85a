"""IMEX AB-CN and one-leg stepper tests (the reference versions are
legacy/non-callable; the math is specified in its methods.jl docstrings —
verified here by TGV convergence)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops._stencil import slc
from ins_tpu.time_steppers.methods import (
    AdamsBashforthCrankNicolsonMethod,
    OneLegMethod,
)


def _tgv_setup(n, Re=100.0):
    lims = (0.0, 2 * np.pi)
    x = (np.linspace(*lims, n + 1), np.linspace(*lims, n + 1))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, Re=Re, dtype=jnp.float64)


def _tgv_u(setup, t):
    decay = np.exp(-2 * t / float(setup.Re))

    def ufunc(dim, x, y):
        return (
            -(dim == 0) * jnp.sin(x) * jnp.cos(y)
            + (dim == 1) * jnp.cos(x) * jnp.sin(y)
        ) * decay

    return ins.velocityfield(setup, ufunc, t, doproject=False)


def _final_error(method, n, dt, tend=0.5):
    setup = _tgv_setup(n)
    u0 = _tgv_u(setup, 0.0)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=method
    )
    uref = _tgv_u(setup, tend)
    g = setup.grid
    err2 = ref2 = 0.0
    for a in range(2):
        sl = (a,) + slc(g.Iu[a])
        err2 += float(jnp.sum((state.u[sl] - uref[sl]) ** 2))
        ref2 += float(jnp.sum(uref[sl] ** 2))
    return np.sqrt(err2 / ref2)


def test_abcn_accuracy_and_dt_convergence():
    """Temporal convergence of AB-CN (theta=1/2, 2nd order): compare
    against a fine-dt run on the same grid (isolates the time error)."""
    m = AdamsBashforthCrankNicolsonMethod()
    n, tend = 32, 0.5
    setup = _tgv_setup(n, Re=20.0)  # low Re: strong diffusion, IMEX regime
    u0 = _tgv_u(setup, 0.0)

    def run(dt):
        state, _ = ins.solve_unsteady(
            setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=m
        )
        return state.u

    uref = run(1.25e-3)
    errs = []
    for dt in (2e-2, 1e-2):
        u = run(dt)
        errs.append(float(jnp.linalg.norm(u - uref) / jnp.linalg.norm(uref)))
    assert errs[0] < 1e-3
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.5, (errs, rate)  # ~2nd order in time


def test_oneleg_runs_stably():
    m = OneLegMethod()
    e = _final_error(m, 64, 5e-3)
    assert np.isfinite(e)
    assert e < 5e-3


def test_abcn_divergence_free():
    setup = _tgv_setup(32)
    u0 = _tgv_u(setup, 0.0)
    state, _ = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.1),
        dt=1e-2,
        method=AdamsBashforthCrankNicolsonMethod(),
    )
    div = ins.divergence(state.u, setup)
    assert float(jnp.max(jnp.abs(div))) < 1e-9
