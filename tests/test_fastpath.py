"""Ghost-free periodic fast path: must reproduce the ghosted reference
path through solve_unsteady."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.fastpath import fastpath_applicable
from ins_tpu.ops.pressure import psolver_cg, psolver_spectral


def _setup(n=32, D=2, Re=1e3, **kw):
    x = (np.linspace(0, 2 * np.pi, n + 1),) * D
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * D
    return ins.Setup(x=x, boundary_conditions=bc, Re=Re, dtype=jnp.float64, **kw)


def _u0(setup):
    return ins.random_field(setup, kp=4, rng=jax.random.PRNGKey(0))


def test_applicability():
    setup = _setup()
    ps = psolver_spectral(setup)
    assert fastpath_applicable(setup, ins.RKMethods.RK44(), ps)
    assert fastpath_applicable(setup, ins.LMWray3(), ps)
    # hat carry (step-boundary merge) needs the fused merged chain,
    # which is TPU-only: on CPU the factory must decline gracefully
    # (solve_unsteady then scans the plain per-step fast path).
    from ins_tpu.ops.fastpath import make_fast_timestep_hat

    if jax.default_backend() != "tpu":
        assert make_fast_timestep_hat(setup, ins.RKMethods.RK44()) is None
    # CG solver: not spectral -> no fast path
    assert not fastpath_applicable(setup, ins.RKMethods.RK44(), psolver_cg(setup))
    # stretched grid -> no fast path
    s2 = ins.Setup(
        x=(ins.tanh_grid(0, 1, 16),) * 2,
        boundary_conditions=((ins.DirichletBC(), ins.DirichletBC()),) * 2,
        dtype=jnp.float64,
    )
    assert not fastpath_applicable(s2, ins.RKMethods.RK44(), ps)


@pytest.mark.parametrize("method", ["rk44", "lmwray3"])
def test_fastpath_matches_ghosted(method):
    setup = _setup()
    m = ins.RKMethods.RK44() if method == "rk44" else ins.LMWray3()
    ps = psolver_spectral(setup)
    u0 = _u0(setup)

    s_fast, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.05), dt=1e-2, method=m, psolver=ps
    )
    # Force the ghosted path with the CG solver at tight tolerance
    s_ref, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.05), dt=1e-2, method=m,
        psolver=psolver_cg(setup, reltol=1e-13),
    )
    diff = float(jnp.max(jnp.abs(s_fast.u - s_ref.u)))
    assert diff < 1e-9, diff
    assert s_fast.u.shape == u0.shape  # public state is re-ghosted


def test_fastpath_with_bodyforce_and_closure():
    force = lambda d, x, y, t: (d == 0) * jnp.sin(2 * y)
    setup = _setup(bodyforce=force, issteadybodyforce=True)
    base = _setup()
    les = _setup(closure_model=ins.smagorinsky_closure_natural(base))
    ps = psolver_spectral(setup)
    u0 = _u0(base)

    # Bodyforce: fast (spectral) vs ghosted (CG) agree
    sf, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.02), dt=1e-2, psolver=ps
    )
    sg, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.02), dt=1e-2,
        psolver=psolver_cg(setup, reltol=1e-13),
    )
    assert float(jnp.max(jnp.abs(sf.u - sg.u))) < 1e-9

    # Closure: fast vs ghosted agree
    th = jnp.asarray(0.1, jnp.float64)
    sf, _ = ins.solve_unsteady(
        setup=les, ustart=u0, tlims=(0, 0.02), dt=1e-2, psolver=ps, theta=th
    )
    sg, _ = ins.solve_unsteady(
        setup=les, ustart=u0, tlims=(0, 0.02), dt=1e-2,
        psolver=psolver_cg(les, reltol=1e-13), theta=th,
    )
    assert float(jnp.max(jnp.abs(sf.u - sg.u))) < 1e-9


def test_fastpath_3d_and_processors():
    setup = _setup(n=16, D=3, Re=2e3)
    ps = psolver_spectral(setup)
    u0 = _u0(setup)
    saver = ins.fieldsaver(nupdate=2)
    s, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.04), dt=1e-2, psolver=ps,
        processors={"f": saver},
    )
    assert not np.any(np.isnan(s.u))
    assert len(out["f"]) == 2
    # Processor states are ghosted (public layout)
    assert out["f"][0]["u"].shape == u0.shape
    # Ghosts satisfy periodicity
    un = np.asarray(s.u)
    np.testing.assert_allclose(un[:, 0], un[:, -2])
    np.testing.assert_allclose(un[:, -1], un[:, 1])


def test_fastpath_adaptive_dt():
    setup = _setup(n=16)
    ps = psolver_spectral(setup)
    u0 = _u0(setup)
    s, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.03), dt=None, cfl=0.5, psolver=ps
    )
    assert float(s.t) == pytest.approx(0.03, abs=1e-12)
    assert not np.any(np.isnan(s.u))


@pytest.mark.parametrize("method", ["rk44", "lmwray3"])
@pytest.mark.parametrize("dodissipation", [False, True])
def test_fastpath_temperature_matches_ghosted(method, dodissipation):
    """Boussinesq temperature on the fast path (periodic temp BCs): must
    reproduce the ghosted path, incl. the dissipation term."""
    n, D = 16, 2
    x = (np.linspace(0, 2 * np.pi, n + 1),) * D
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * D
    te = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=0.5, boundary_conditions=bc, gdir=1,
        dodissipation=dodissipation, dtype=jnp.float64,
    )
    setup = ins.Setup(
        x=x, boundary_conditions=bc, temperature=te, dtype=jnp.float64
    )
    m = ins.RKMethods.RK44() if method == "rk44" else ins.LMWray3()
    ps = psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(3))
    g = setup.grid
    xp = np.meshgrid(*[np.asarray(g.xp[d]) for d in range(D)], indexing="ij")
    t0 = jnp.asarray(np.sin(xp[0]) * np.cos(xp[1]), jnp.float64)

    assert fastpath_applicable(setup, m, ps)
    s_fast, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tempstart=t0, tlims=(0.0, 0.03), dt=1e-2,
        method=m, psolver=ps,
    )
    s_ref, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tempstart=t0, tlims=(0.0, 0.03), dt=1e-2,
        method=m, psolver=psolver_cg(setup, reltol=1e-13),
    )
    assert float(jnp.max(jnp.abs(s_fast.u - s_ref.u))) < 1e-9
    assert float(jnp.max(jnp.abs(s_fast.temp - s_ref.temp))) < 1e-9
    # public temp layout is re-ghosted and periodic
    tn = np.asarray(s_fast.temp)
    np.testing.assert_allclose(tn[0], tn[-2])


def test_hat_bf16_stream_storage():
    """bf16 stream storage on the merged hat chain (interpret mode):
    velocity-like arrays stored bf16, arithmetic/qhat at f32 — the
    chain runs, the carry holds the requested dtype, and the result
    tracks the f32 chain to bf16-roundoff accumulation."""
    import numpy as np

    from ins_tpu.ops.fastpath import make_fast_timestep_hat, strip_ghosts
    from ins_tpu.time_steppers.step import StepperState

    n = 32
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3,
                      dtype=jnp.float32)
    ps = ins.psolver_spectral(setup)
    u0 = strip_ghosts(jax.jit(
        lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k)
    )(jax.random.PRNGKey(0)))
    m = ins.RKMethods.RK44()
    res = {}
    for sd in (None, jnp.bfloat16):
        fns = make_fast_timestep_hat(
            setup, m, stream_dtype=sd, _fused_interpret=True,
            projection_precision="highest",
        )
        assert fns is not None
        to_hat, step_hat, from_hat = fns
        h = to_hat(StepperState(
            u=u0, temp=None, t=jnp.float32(0), n=jnp.asarray(0)
        ))
        if sd is not None:
            assert h.ut.dtype == jnp.bfloat16
        for _ in range(3):
            h = step_hat(h, jnp.float32(5e-3), None)
        s = from_hat(h)
        assert s.u.dtype == jnp.float32
        res[sd is None] = s.u
    err = float(jnp.max(jnp.abs(res[False] - res[True]))
                / jnp.max(jnp.abs(res[True])))
    assert np.isfinite(err) and err < 5e-2, err


def test_unmerged_bf16_stream_fallback():
    """bf16 stream storage over the UNMERGED fused chain (the 512^3
    production path, where the merged chain is VMEM-gated off): the
    hat builder returns a (cast, step_unmerged, uncast) triple whose
    carry holds bf16 u; stage kernels upcast windows to f32."""
    import numpy as np

    from ins_tpu.ops.fastpath import (
        make_fast_timestep,
        make_fast_timestep_hat,
        strip_ghosts,
    )
    from ins_tpu.time_steppers.step import StepperState

    n = 32
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3,
                      dtype=jnp.float32)
    ps = ins.psolver_spectral(setup)
    u0 = strip_ghosts(jax.jit(
        lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k)
    )(jax.random.PRNGKey(0)))
    # SSP33 is NOT classic-row, so use_merged is False and the
    # stream_dtype request takes the unmerged fallback
    m = ins.RKMethods.SSP33()
    step32 = make_fast_timestep(setup, m, _fused_interpret=True,
                                projection_precision="highest")
    s = StepperState(u=u0, temp=None, t=jnp.float32(0), n=jnp.asarray(0))
    for _ in range(2):
        s = step32(s, jnp.float32(5e-3), None)
    fns = make_fast_timestep_hat(
        setup, m, stream_dtype=jnp.bfloat16, _fused_interpret=True,
        projection_precision="highest",
    )
    assert fns is not None, "unmerged bf16 fallback not engaged"
    to_sd, step_sd, from_sd = fns
    h = to_sd(StepperState(
        u=u0, temp=None, t=jnp.float32(0), n=jnp.asarray(0)
    ))
    assert h.u.dtype == jnp.bfloat16
    for _ in range(2):
        h = step_sd(h, jnp.float32(5e-3), None)
    assert h.u.dtype == jnp.bfloat16
    s2 = from_sd(h)
    assert s2.u.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(s2.u - s.u)) / jnp.max(jnp.abs(s.u)))
    assert np.isfinite(err) and err < 5e-2, err
