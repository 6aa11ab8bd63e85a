"""Boussinesq temperature on the FUSED Pallas stage chain.

VERDICT r3 item 5: the reference treats the temperature RHS as
first-class in the hot loop (src/time_steppers/step_explicit_runge_kutta
.jl:20-28, src/operators.jl:711-808,916-931); round 3 still ran 3D
Rayleigh-Bénard through per-op roll-graph kernels.  Here the buoyancy
force and the temperature convection-diffusion (+ dissipation) ride the
fused momentum+stage+divhat kernels (and the merged pcmsd / hat-carry
chain) with the stage's own tableau coefficients.

These tests run the PRODUCTION step functions (step_merged /
step_merged_hat / step_unmerged fused branches) with every Pallas kernel
in interpreter mode (`_fused_interpret=True`) and pin them against the
roll-graph twin, which itself is pinned against the ghosted solver path
in test_fastpath.py::test_fastpath_temperature_matches_ghosted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops import pallas_kernels as pk
from ins_tpu.ops.fastpath import (
    make_fast_timestep,
    make_fast_timestep_hat,
)
from ins_tpu.time_steppers.step import StepperState


def _setup_temp(n=16, dodissipation=True, gdir=1, bodyforce=False):
    x = (np.linspace(0.0, 1.0, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    te = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=0.4, boundary_conditions=bc, gdir=gdir,
        dodissipation=dodissipation, dtype=jnp.float64,
    )
    kw = {}
    if bodyforce:
        kw = dict(
            bodyforce=lambda d, x, y, z, t: (d == 0) * jnp.sin(
                2 * jnp.pi * y
            ),
            issteadybodyforce=True,
        )
    return ins.Setup(
        x=x, boundary_conditions=bc, Re=500.0, temperature=te,
        dtype=jnp.float64, **kw,
    )


def _interior_state(setup, seed=0):
    rng = np.random.default_rng(seed)
    N = tuple(int(v) for v in setup.grid.Np)
    u = jnp.asarray(0.1 * rng.standard_normal((3,) + N), jnp.float64)
    temp = jnp.asarray(
        0.5 + 0.1 * rng.standard_normal(N), jnp.float64
    )
    return StepperState(u=u, temp=temp, t=jnp.float64(0.0), n=0)


def _run(step, state, nsteps=3, dt=1e-3):
    for _ in range(nsteps):
        state = step(state, dt, None)
    return state


CASES = [
    # (method, dodissipation, gdir, bodyforce, merged) — interpret-mode
    # kernels are slow (~1.5 min/case), so the matrix covers each step
    # function (merged / unmerged x ERK / LMWray3) once plus the
    # bodyforce-stream + gdir=0 + no-dissipation variants on the merged
    # production chain.
    ("rk44", True, 1, False, True),
    ("rk44", True, 1, False, False),
    ("rk44", False, 0, True, True),
    ("lmwray3", True, 1, False, True),
    ("lmwray3", False, 2, True, False),
]


def _method(name):
    return ins.RKMethods.RK44() if name == "rk44" else ins.LMWray3()


@pytest.mark.parametrize("case", CASES, ids=[
    f"{m}-dis{int(d)}-g{g}-bf{int(b)}-mg{int(mg)}"
    for m, d, g, b, mg in CASES
])
def test_fused_temperature_step_matches_roll(case, monkeypatch):
    """Production fused/merged step functions with temperature ==
    the roll-graph fast path (f64, interpret-mode kernels)."""
    name, dis, gdir, bf, merged = case
    setup = _setup_temp(dodissipation=dis, gdir=gdir, bodyforce=bf)
    m = _method(name)
    if not merged:
        # force the unmerged fused chain (fused_stage only)
        monkeypatch.setattr(pk, "pcmsd_profitable", lambda *a, **k: False)
    step_roll = make_fast_timestep(
        setup, m, projection_precision="highest"
    )
    step_fused = make_fast_timestep(
        setup, m, projection_precision="highest", _fused_interpret=True
    )
    s0 = _interior_state(setup)
    s_ref = _run(step_roll, s0)
    s_got = _run(step_fused, s0)
    du = float(jnp.max(jnp.abs(s_got.u - s_ref.u)))
    dT = float(jnp.max(jnp.abs(s_got.temp - s_ref.temp)))
    assert du < 1e-10, (case, merged, du)
    assert dT < 1e-10, (case, merged, dT)
    assert float(s_got.t) == pytest.approx(float(s_ref.t))


@pytest.mark.parametrize("name", ["rk44", "lmwray3"])
def test_hat_carry_temperature_matches_roll(name):
    """Step-boundary-merged (ut, qhat) carry with temperature riding the
    merged kernels == the roll-graph fast path over a 3-step chunk."""
    setup = _setup_temp(dodissipation=True, gdir=1)
    m = _method(name)
    step_roll = make_fast_timestep(
        setup, m, projection_precision="highest"
    )
    hat = make_fast_timestep_hat(
        setup, m, projection_precision="highest", _fused_interpret=True
    )
    assert hat is not None
    to_hat, step_hat, from_hat = hat
    s0 = _interior_state(setup, seed=1)
    s_ref = _run(step_roll, s0)
    h = to_hat(s0)
    dt = 1e-3
    for _ in range(3):
        h = step_hat(h, dt, None)
    s_got = from_hat(h)
    du = float(jnp.max(jnp.abs(s_got.u - s_ref.u)))
    dT = float(jnp.max(jnp.abs(s_got.temp - s_ref.temp)))
    assert du < 1e-10, (name, du)
    assert dT < 1e-10, (name, dT)


def test_solver_hat_chunks_and_adaptive_interpret():
    """`solve_unsteady(fastpath_interpret=True)` drives the EXACT
    production single-chip path (fused kernels, hat-carry scan chunks,
    and the adaptive-dt hat while_loop with its lax.cond CFL recompute —
    VERDICT-r3 item 10) on CPU; must match the roll-graph driver."""
    from ins_tpu.ops.pressure import psolver_spectral

    setup = _setup_temp(dodissipation=True, gdir=1)
    ps = psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(5))
    g = setup.grid
    xs = np.meshgrid(
        *[np.asarray(g.xp[d]) for d in range(3)], indexing="ij"
    )
    t0 = jnp.asarray(0.5 + 0.1 * np.sin(2 * np.pi * xs[0]), jnp.float64)

    # fixed dt: scan chunks carry HatState
    kw = dict(setup=setup, ustart=u0, tempstart=t0, psolver=ps)
    s_ref, _ = ins.solve_unsteady(tlims=(0.0, 3e-3), dt=1e-3, **kw)
    s_got, _ = ins.solve_unsteady(
        tlims=(0.0, 3e-3), dt=1e-3, fastpath_interpret=True,
        projection_precision="highest", **kw,
    )
    assert float(jnp.max(jnp.abs(s_got.u - s_ref.u))) < 1e-8
    assert float(jnp.max(jnp.abs(s_got.temp - s_ref.temp))) < 1e-8

    # adaptive dt (n_adapt_dt=2): while_loop over the hat carry,
    # correction only at CFL-recompute boundaries
    s_ref, _ = ins.solve_unsteady(
        tlims=(0.0, 2e-3), dt=None, cfl=0.2, n_adapt_dt=2, **kw
    )
    s_got, _ = ins.solve_unsteady(
        tlims=(0.0, 2e-3), dt=None, cfl=0.2, n_adapt_dt=2,
        fastpath_interpret=True, projection_precision="highest", **kw,
    )
    assert float(s_got.t) == pytest.approx(2e-3, abs=1e-12)
    assert int(s_got.n) == int(s_ref.n)
    assert float(jnp.max(jnp.abs(s_got.u - s_ref.u))) < 1e-8
    assert float(jnp.max(jnp.abs(s_got.temp - s_ref.temp))) < 1e-8


def test_msd_hat_kernel_temperature_outputs():
    """Kernel-level pin: `momentum_stage_divhat_3d(temperature=...)`
    buoyancy + temp RHS == the roll-twin formulas, for the elided
    (stage-0), tstart, and tstart+tacc stream layouts."""
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (1.0 / n,) * 3
    visc = 2e-3
    alpha2, alpha4, dis, gdir = 0.3, 4e-3, 0.7, 1
    rng = np.random.default_rng(31)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float64)
    T = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    Ts = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    Ta = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    cn, cu = 0.17, 0.4

    def rp(v, d):
        return jnp.roll(v, -1, axis=d)

    def rm(v, d):
        return jnp.roll(v, 1, axis=d)

    # roll-twin temp RHS (fastpath.temp_rhs)
    kt = 0.0
    for b in range(3):
        Tp, Tm = rp(T, b), rm(T, b)
        ub = u[b]
        uT2 = ub * 0.5 * (T + Tp)
        uT1 = rm(ub, b) * 0.5 * (Tm + T)
        dT2 = (Tp - T) / dx[b]
        dT1 = (T - Tm) / dx[b]
        kt = kt + (-(uT2 - uT1) + alpha4 * (dT2 - dT1)) / dx[b]
    dacc = 0.0
    for b in range(3):
        ub = u[b]
        diffb = sum(
            (visc / dx[c] ** 2) * (rp(ub, c) - 2.0 * ub + rm(ub, c))
            for c in range(3)
        )
        dacc = dacc + (rm(ub, b) * rm(diffb, b) + ub * diffb) / 2
    kt_dis = kt + dis * dacc
    buoy = alpha2 * 0.5 * (T + rp(T, gdir))

    proj = make_fused_projection(
        (n,) * 3, dx, jnp.float64, precision="highest", interpret=True
    )
    k_ref, ut_ref, dh_ref = pk.momentum_stage_divhat_3d(
        u, (u,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        precision="highest", interpret=True,
    )
    for bx in (None, 2):
        # stage-0 layout: tstart elided (T IS the base), usnew riding
        res = pk.momentum_stage_divhat_3d(
            u, (u,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
            precision="highest", interpret=True, bx=bx,
            usnew_coeff=cu,
            temperature=(T, None, None, gdir, alpha2, alpha4, dis),
        )
        k, ut, dh, usn, tnext, tnew = res
        assert float(jnp.max(jnp.abs(
            k - (k_ref + jnp.stack([buoy * (a == gdir) for a in range(3)]))
        ))) < 1e-12
        assert float(jnp.max(jnp.abs(tnext - (T + cn * kt_dis)))) < 1e-12
        assert float(jnp.max(jnp.abs(tnew - (T + cu * kt_dis)))) < 1e-12

    # tstart + tacc streams, no dissipation
    res = pk.momentum_stage_divhat_3d(
        u, (u,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        precision="highest", interpret=True, usnew_coeff=cu,
        temperature=(T, Ts, Ta, gdir, alpha2, alpha4, None),
    )
    k, ut, dh, usn, tnext, tnew = res
    assert float(jnp.max(jnp.abs(tnext - (Ts + cn * kt)))) < 1e-12
    assert float(jnp.max(jnp.abs(tnew - (Ta + cu * kt)))) < 1e-12


def test_pcmsd_kernel_temperature_matches_unmerged():
    """Merged pc+msd kernel with temperature (incl. RECON base) == the
    explicit correct -> msd_hat(temperature=...) chain."""
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (1.0 / n,) * 3
    visc = 2e-3
    alpha2, alpha4, dis, gdir = 0.3, 4e-3, 0.7, 0
    rng = np.random.default_rng(37)
    ut_prev = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float64)
    qhat = 0.1 * jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    T = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    Ts = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float64)
    cn, cu = 0.21, 0.35

    proj = make_fused_projection(
        (n,) * 3, dx, jnp.float64, precision="highest", interpret=True
    )
    u_ref = pk.pressure_correct_qhat_3d(
        ut_prev, qhat, dx, proj["V"], proj["VT"],
        precision="highest", interpret=True,
    )
    ref = pk.momentum_stage_divhat_3d(
        u_ref, (u_ref,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        precision="highest", interpret=True, usnew_coeff=cu,
        temperature=(T, Ts, None, gdir, alpha2, alpha4, dis),
    )
    k_ref, ut_ref2, dh_ref, usn_ref, tnext_ref, tnew_ref = ref

    for bx in (None, 4):
        got = pk.pcmsd_hat_3d(
            ut_prev, qhat, (pk.RECON,), (cn,), visc, dx, proj,
            precision="highest", interpret=True, emit_k=False,
            usnew_coeff=cu, emit_u=True, bx=bx,
            temperature=(T, Ts, None, gdir, alpha2, alpha4, dis),
        )
        ut2, dh2, usn2, u_em, tnext, tnew = got
        assert float(jnp.max(jnp.abs(u_em - u_ref))) < 1e-11
        assert float(jnp.max(jnp.abs(ut2 - ut_ref2))) < 1e-11
        assert float(jnp.max(jnp.abs(tnext - tnext_ref))) < 1e-11
        assert float(jnp.max(jnp.abs(tnew - tnew_ref))) < 1e-11
