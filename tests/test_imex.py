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


def test_implicit_rk_backward_euler_and_midpoint():
    """Implicit RK (Picard stages): BE11 is 1st order, GL1 (implicit
    midpoint) is 2nd order on the TGV decay; both unconditionally stable
    at the tested dt."""
    from ins_tpu.time_steppers.rk_methods import BE11, GL1

    n, tend = 32, 0.4
    setup = _tgv_setup(n, Re=50.0)
    u0 = _tgv_u(setup, 0.0)

    def run(method, dt):
        state, _ = ins.solve_unsteady(
            setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=method
        )
        return state.u

    # Fine-dt reference on the same grid isolates the temporal error
    uref = run(ins.RKMethods.RK44(), 1.25e-3)
    errs = {
        dt: float(jnp.linalg.norm(run(BE11(), dt) - uref) / jnp.linalg.norm(uref))
        for dt in (4e-2, 2e-2)
    }
    assert errs[4e-2] < 0.05
    rate = np.log2(errs[4e-2] / errs[2e-2])
    assert 0.7 < rate < 1.4, (errs, rate)  # BE: 1st order in time

    # Implicit midpoint: markedly more accurate than BE at the same dt
    em = float(jnp.linalg.norm(run(GL1(), 2e-2) - uref) / jnp.linalg.norm(uref))
    assert em < errs[2e-2] / 5, (em, errs)


def test_trainepoch():
    import jax as _jax

    import ins_tpu.models as nc

    x = np.random.default_rng(0).standard_normal((20, 8, 8, 2)).astype(np.float32)
    y = 0.5 * x
    # trivial linear closure
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, v):
            w = self.param("w", nn.initializers.zeros, ())
            return w * v

    mod = Lin()
    theta = mod.init(_jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    f = lambda v, th: mod.apply({"params": th}, v)
    loss = nc.create_loss_prior(f)
    ts = nc.create_trainstate(theta, lr=0.2, rng=_jax.random.PRNGKey(1))
    for _ in range(30):
        out = nc.trainepoch(
            data=(x, y), batchsize=5, loss=loss, trainstate=ts,
            noiselevel=None,
        )
        ts = out["trainstate"]
    w = float(ts["theta"]["w"])
    assert abs(w - 0.5) < 0.05, w


def test_implicit_rk_newton_stiff():
    """Newton-Krylov stages make DIRK/Gauss methods stiff-capable: stable
    and accurate at ~10x the explicit diffusive limit (VERDICT: reference
    step_implicit_runge_kutta.jl Newton solver counterpart)."""
    from ins_tpu.time_steppers.rk_methods import BE11, GL1, RK44

    n, Re = 32, 5.0
    setup = _tgv_setup(n, Re=Re)
    u0 = _tgv_u(setup, 0.0)
    # explicit diffusive limit: nu dt / dx^2 <= 1/4 (2D)
    dx = 2 * np.pi / n
    dt_exp = 0.25 * dx**2 * Re
    # explicit RK44 at 4x the diffusive limit must blow up or corrupt
    s_exp, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 40 * dt_exp), dt=4 * dt_exp,
        method=RK44(),
    )
    exp_bad = (not bool(jnp.all(jnp.isfinite(s_exp.u)))) or float(
        jnp.max(jnp.abs(s_exp.u))
    ) > 10.0

    tend = 1.0
    uref = _tgv_u(setup, tend)

    def relerr(method, dt):
        s, _ = ins.solve_unsteady(
            setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=method
        )
        g = setup.grid
        e2 = r2 = 0.0
        for a in range(2):
            sl = (a,) + slc(g.Iu[a])
            e2 += float(jnp.sum((s.u[sl] - uref[sl]) ** 2))
            r2 += float(jnp.sum(uref[sl] ** 2))
        return np.sqrt(e2 / r2)

    dt_stiff = 10 * dt_exp  # ~0.48: far beyond the explicit limit
    e_be = relerr(BE11(), dt_stiff)
    e_gl = relerr(GL1(), dt_stiff)
    assert exp_bad, "explicit run unexpectedly stable; test config too lax"
    assert np.isfinite(e_be) and e_be < 0.2, e_be
    assert np.isfinite(e_gl) and e_gl < 0.02, e_gl  # 2nd order: much better


def _time_error(method, setup, u0, dt, tend):
    """Error vs a fine-dt RK44 run on the same grid (isolates the
    temporal error, including the startup step's)."""
    s, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, method=method
    )
    from ins_tpu.time_steppers.rk_methods import RK44

    sref, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt / 16, method=RK44()
    )
    return float(jnp.linalg.norm(s.u - sref.u) / jnp.linalg.norm(sref.u))


def test_oneleg_startup_restores_order():
    """RK startup (reference method_startup) vs first-order u_{-1}=u_0
    startup: the startup method must cut the temporal error."""
    setup = _tgv_setup(32, Re=20.0)
    u0 = _tgv_u(setup, 0.0)
    e_rk = _time_error(OneLegMethod(), setup, u0, 1e-2, 0.1)
    e_first = _time_error(
        OneLegMethod(method_startup=False), setup, u0, 1e-2, 0.1
    )
    assert e_rk < 0.5 * e_first, (e_rk, e_first)


def test_abcn_startup_improves():
    setup = _tgv_setup(32, Re=20.0)
    u0 = _tgv_u(setup, 0.0)
    e = _time_error(
        AdamsBashforthCrankNicolsonMethod(), setup, u0, 1e-2, 0.1
    )
    e0 = _time_error(
        AdamsBashforthCrankNicolsonMethod(method_startup=False),
        setup, u0, 1e-2, 0.1,
    )
    assert np.isfinite(e) and e <= e0, (e, e0)
