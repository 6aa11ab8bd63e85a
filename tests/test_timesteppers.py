"""Time-stepper tests.

Mirrors reference test/timesteppers.jl (method consistency incl.
temperature) and the TGV convergence study of
examples/TaylorGreenVortex2D.jl:26-96 (the reference's first-light
accuracy case: O(n^-2) L2 convergence against the analytic solution).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops._stencil import seg, slc


def _tgv_setup(n, Re=2000.0):
    lims = (0.0, 2 * np.pi)
    x = (np.linspace(*lims, n + 1), np.linspace(*lims, n + 1))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, Re=Re, dtype=jnp.float64)


def _tgv_solution(setup, t=0.0):
    """Analytic Taylor-Green solution on the staggered points."""
    Re = float(setup.Re)
    decay = np.exp(-2 * t / Re)

    def ufunc(dim, x, y):
        return (
            -(dim == 0) * jnp.sin(x) * jnp.cos(y)
            + (dim == 1) * jnp.cos(x) * jnp.sin(y)
        ) * decay

    return ufunc


def _tgv_error(n, method, dt=1e-2, tend=1.0):
    setup = _tgv_setup(n)
    ufunc0 = _tgv_solution(setup, 0.0)
    u0 = ins.velocityfield(setup, ufunc0, 0.0, doproject=False)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=method
    )
    uref_f = _tgv_solution(setup, tend)
    uref = ins.velocityfield(setup, uref_f, tend, doproject=False)
    # Relative L2 error over the velocity DOFs
    g = setup.grid
    err2, ref2 = 0.0, 0.0
    for a in range(g.dim):
        sl = (a,) + slc(g.Iu[a])
        err2 += float(jnp.sum((state.u[sl] - uref[sl]) ** 2))
        ref2 += float(jnp.sum(uref[sl] ** 2))
    return np.sqrt(err2 / ref2)


def test_tgv_convergence_rk44():
    """Spatial O(n^-2) convergence on the analytic TGV solution."""
    errs = [_tgv_error(n, ins.RKMethods.RK44()) for n in (16, 32, 64)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert errs[-1] < 2e-3
    for r in rates:
        assert r > 1.8, (errs, rates)


def test_lmwray3_matches_rk_family():
    """LMWray3 and the shifted-tableau Wray3 integrate the same flow to
    the same accuracy order; cross-check trajectories agree closely
    (analogue of the reference inplace == outofplace test)."""
    setup = _tgv_setup(32)
    u0 = ins.velocityfield(setup, _tgv_solution(setup), 0.0, doproject=False)
    s1, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.1), dt=1e-2, method=ins.LMWray3()
    )
    s2, _ = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.1),
        dt=1e-2,
        method=ins.RKMethods.Wray3(),
    )
    diff = float(jnp.max(jnp.abs(s1.u - s2.u)))
    assert diff < 1e-7


def test_adaptive_dt():
    setup = _tgv_setup(16)
    u0 = ins.velocityfield(setup, _tgv_solution(setup), 0.0, doproject=False)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.05), dt=None, cfl=0.5
    )
    assert float(state.t) == pytest.approx(0.05, abs=1e-10)
    assert not np.any(np.isnan(state.u))


def test_energy_conservation_inviscid_tendency():
    """With the projection and skew-symmetric convection, kinetic energy
    decays (viscosity) and never grows."""
    setup = _tgv_setup(32, Re=1000.0)
    u0 = ins.velocityfield(setup, _tgv_solution(setup), 0.0, doproject=False)
    e0 = float(ins.total_kinetic_energy(u0, setup))
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.5), dt=1e-2
    )
    e1 = float(ins.total_kinetic_energy(state.u, setup))
    assert e1 < e0
    # decay rate matches analytic exp(-4 t / Re) for TGV
    expected = e0 * np.exp(-4 * 0.5 / 1000.0)
    assert e1 == pytest.approx(expected, rel=1e-3)


def test_dirichlet_unsteady_smoke(setup2d, u2d):
    """General-BC configuration (stretched Dirichlet + temperature +
    body force) runs stably with the CG solver."""
    from ins_tpu.ops.pressure import psolver_cg

    setup = setup2d
    temp0 = ins.temperaturefield(setup, lambda x, y: 1.0 - y)
    state, _ = ins.solve_unsteady(
        setup=setup,
        ustart=u2d,
        tempstart=temp0,
        tlims=(0.0, 2e-3),
        dt=1e-4,
        psolver=psolver_cg(setup),
    )
    assert not np.any(np.isnan(state.u))
    assert not np.any(np.isnan(state.temp))


def test_processors_run():
    setup = _tgv_setup(16)
    u0 = ins.velocityfield(setup, _tgv_solution(setup), 0.0, doproject=False)
    saver = ins.fieldsaver(nupdate=2)
    obs = ins.observefield(
        lambda s: ins.total_kinetic_energy(s["u"], setup), nupdate=2
    )
    state, out = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.1),
        dt=1e-2,
        processors={"fields": saver, "ehist": obs},
    )
    assert len(out["fields"]) == 5
    assert len(out["ehist"]) == 5
    assert out["fields"][0]["u"].shape == u0.shape
