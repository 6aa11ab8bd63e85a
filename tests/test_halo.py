"""Explicit shard_map halo-exchange stepping vs single-device references
(must match to roundoff): 1-D slab and 2-D pencil meshes, pencil-FFT and
psum-CG pressure solves, Boussinesq temperature coupling, donation
semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.fastpath import make_fast_timestep, strip_ghosts
from ins_tpu.parallel import make_mesh
from ins_tpu.parallel.halo import (
    make_halo_fast_step,
    shard_interior,
    shard_scalar,
)
from ins_tpu.time_steppers.step import StepperState

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup3d(n=16, temperature=None):
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    return ins.Setup(
        x=x, boundary_conditions=bc, Re=1e3, temperature=temperature,
        dtype=jnp.float64,
    )


def _ref_fast(setup, u0, dt, nsteps):
    method = ins.RKMethods.RK44()
    fast = make_fast_timestep(setup, method)
    s = StepperState(u=u0, temp=None, t=jnp.asarray(0.0), n=jnp.asarray(0))
    for _ in range(nsteps):
        s = fast(s, jnp.asarray(dt), None)
    return s


@needs8
@pytest.mark.parametrize("nshards", [2, 4, 8])
def test_halo_step_matches_fastpath(nshards):
    n = 16
    setup = _setup3d(n)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(0))
    u0 = strip_ghosts(ug)
    dt = 5e-3
    s_ref = _ref_fast(setup, u0, dt, 5)

    mesh = make_mesh((nshards,), devices=jax.devices()[:nshards])
    step = make_halo_fast_step(setup, method, mesh)
    s_par = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0), n=jnp.asarray(0),
    )
    for _ in range(5):
        s_par = step(s_par, dt)

    diff = float(jnp.max(jnp.abs(s_par.u - s_ref.u)))
    assert diff < 1e-12, diff


@needs8
@pytest.mark.parametrize("mshape", [(2, 2), (2, 4)])
@pytest.mark.parametrize("psolver", ["pencil", "cg"])
def test_halo_2d_mesh(mshape, psolver):
    """x/y-pencil decomposition, both pressure solves == single device."""
    n = 16
    setup = _setup3d(n)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(1))
    u0 = strip_ghosts(ug)
    dt = 5e-3
    s_ref = _ref_fast(setup, u0, dt, 3)

    ndev = int(np.prod(mshape))
    mesh = make_mesh(mshape, devices=jax.devices()[:ndev])
    step = make_halo_fast_step(setup, method, mesh, psolver=psolver)
    s_par = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0), n=jnp.asarray(0),
    )
    for _ in range(3):
        s_par = step(s_par, dt)

    tol = 1e-12 if psolver == "pencil" else 1e-9  # CG reltol ~ sqrt(eps)
    diff = float(jnp.max(jnp.abs(s_par.u - s_ref.u)))
    assert diff < tol, diff


@needs8
def test_halo_cg_1d_mesh():
    n = 16
    setup = _setup3d(n)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(2))
    u0 = strip_ghosts(ug)
    dt = 5e-3
    s_ref = _ref_fast(setup, u0, dt, 3)

    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(setup, method, mesh, psolver="cg")
    s_par = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0), n=jnp.asarray(0),
    )
    for _ in range(3):
        s_par = step(s_par, dt)
    assert float(jnp.max(jnp.abs(s_par.u - s_ref.u))) < 1e-9


@needs8
@pytest.mark.parametrize("mshape", [(4,), (2, 2)])
@pytest.mark.parametrize("dodissipation", [False, True])
def test_halo_temperature(mshape, dodissipation):
    """Periodic Boussinesq coupling on the halo path == the ghosted
    reference stepper (strip/reghost across the layout boundary)."""
    from ins_tpu.boundary_conditions import apply_bc_temp, apply_bc_u
    from ins_tpu.ops.fastpath import reghost
    from ins_tpu.time_steppers.step import timestep

    n = 16
    tbc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    temperature = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=1.0, dodissipation=dodissipation,
        boundary_conditions=tbc, gdir=1, dtype=jnp.float64,
    )
    setup = _setup3d(n, temperature=temperature)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(3))
    zero = jnp.asarray(0.0, jnp.float64)
    Tg = apply_bc_temp(
        jnp.asarray(
            np.random.default_rng(4).standard_normal(setup.grid.N) * 0.1
        ),
        zero, setup,
    )
    dt = 2e-3

    # ghosted reference stepper (general path handles temperature)
    s_ref = StepperState(u=ug, temp=Tg, t=zero, n=jnp.asarray(0))
    for _ in range(3):
        s_ref = timestep(method, s_ref, jnp.asarray(dt), setup=setup,
                         psolver=ps)

    ndev = int(np.prod(mshape))
    mesh = make_mesh(mshape, devices=jax.devices()[:ndev])
    step = make_halo_fast_step(setup, method, mesh)
    D = 3
    u0 = strip_ghosts(ug)
    T0 = Tg[(slice(1, -1),) * D]
    s_par = StepperState(
        u=shard_interior(mesh, u0),
        temp=shard_scalar(mesh, T0),
        t=zero, n=jnp.asarray(0),
    )
    for _ in range(3):
        s_par = step(s_par, dt)

    du = float(jnp.max(jnp.abs(s_par.u - strip_ghosts(s_ref.u))))
    dT = float(jnp.max(jnp.abs(s_par.temp - s_ref.temp[(slice(1, -1),) * D])))
    assert du < 1e-11, du
    assert dT < 1e-11, dT


def _setup3d_f32(n=32, **kw):
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    return ins.Setup(
        x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32, **kw
    )


def _fast_ref(setup, u0, T0, method, dt, nsteps):
    s = StepperState(
        u=u0, temp=T0, t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0)
    )
    fast = make_fast_timestep(setup, method)
    for _ in range(nsteps):
        s = fast(s, jnp.asarray(dt, jnp.float32), jnp.asarray(0.17))
    return s


@needs8
@pytest.mark.parametrize("merge", [False, True])
@pytest.mark.parametrize("method", ["rk44", "lmwray3"])
def test_halo_fused_chain_matches_fastpath(method, merge):
    """The per-shard FUSED Pallas chain (in-kernel tableau accumulation +
    z/y eigen transforms, all_to_all'd pass B, fused qhat correction) in
    interpreter mode == the single-chip fast path (f32).  ``merge=True``
    additionally routes the interior stages through the merged
    pc+momentum kernel (`pcmsd_hat_halo_3d`: u reconstructed in VMEM,
    never round-tripping HBM between stages)."""
    n = 32
    setup = _setup3d_f32(n)
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44() if method == "rk44" else ins.LMWray3()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(7)
        )
    )
    dt = 5e-3
    s_ref = _fast_ref(setup, u0, None, m, dt, 3)

    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True,
        projection_precision="highest", merge=merge,
    )
    assert step.fused, "fused chain must be selected on the x-slab cube"
    assert step.merged == merge
    s = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(3):
        s = step(s, dt)
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6


@needs8
@pytest.mark.parametrize("method", ["rk44", "lmwray3"])
def test_halo_hat_carry_matches_fastpath(method):
    """The sharded step-boundary merge (`step.hat`: scan chunks carry a
    sharded (ut, qhat) HatState; stage 0 reconstructs the previous
    step's corrected u in VMEM via the RECON base) == the single-chip
    fast path (f32) — the final correction only materializes at
    `from_hat`."""
    n = 32
    setup = _setup3d_f32(n)
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44() if method == "rk44" else ins.LMWray3()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(11)
        )
    )
    dt = 5e-3
    s_ref = _fast_ref(setup, u0, None, m, dt, 3)

    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True,
        projection_precision="highest", merge=True,
    )
    assert step.hat is not None, "hat carry must be available when merged"
    to_hat, step_hat, from_hat = step.hat
    s = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    h = to_hat(s)
    for _ in range(3):
        h = step_hat(h, dt, 0.17)
    s = from_hat(h)
    assert int(s.n) == 3
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6


@needs8
def test_solve_unsteady_halo_hat_integration():
    """solve_unsteady(halo=True) fixed-dt scan chunks ride the sharded
    hat carry and agree with per-step halo stepping."""
    n = 32
    setup = _setup3d_f32(n)
    ps = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
        jax.random.PRNGKey(12)
    )
    mesh = make_mesh((4,), devices=jax.devices()[:4])
    dt = 5e-3
    sfin, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 4 * dt), dt=dt,
        mesh=mesh, halo=True, halo_interpret=True,
    )
    ufin = sfin.u
    # reference: per-step halo stepping (merged chain, no hat carry)
    m = ins.RKMethods.RK44()
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True, merge=True,
    )
    s = StepperState(
        u=shard_interior(mesh, strip_ghosts(u0)), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(4):
        s = step(s, dt)
    assert (
        float(jnp.max(jnp.abs(ufin[:, 1:-1, 1:-1, 1:-1] - s.u))) < 1e-5
    )


@needs8
def test_halo_fused_temperature_bodyforce():
    """Fused halo chain with Boussinesq temperature (+dissipation) and a
    steady body force == the single-chip fast path (f32)."""
    n = 32
    tbc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    te = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=0.5, dodissipation=True,
        boundary_conditions=tbc, gdir=2, dtype=jnp.float32,
    )
    bodyforce = lambda d, x, y, z, t: (d == 0) * 0.5 * jnp.sin(y)
    setup = _setup3d_f32(
        n, temperature=te, bodyforce=bodyforce, issteadybodyforce=True
    )
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(8)
        )
    )
    g = setup.grid
    xp = np.meshgrid(
        *[np.asarray(g.xp[d])[1:-1] for d in range(3)], indexing="ij"
    )
    T0 = jnp.asarray(
        0.1 * np.sin(xp[0]) * np.cos(xp[1]), jnp.float32
    )
    dt = 2e-3
    s_ref = _fast_ref(setup, u0, T0, m, dt, 3)

    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True, projection_precision="highest"
    )
    assert step.fused
    s = StepperState(
        u=shard_interior(mesh, u0), temp=shard_scalar(mesh, T0),
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(3):
        s = step(s, dt)
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6
    assert float(jnp.max(jnp.abs(s.temp - s_ref.temp))) < 5e-6


@needs8
@pytest.mark.parametrize("merge", [False, True])
def test_halo_fused_smagorinsky(merge):
    """Fused halo chain with the natural-form Smagorinsky closure (the
    north-star LES config, sharded) == the single-chip fast path (f32);
    ``merge=True`` runs the widened-ghost merged kernel."""
    n = 32
    base = _setup3d_f32(n)
    setup = _setup3d_f32(
        n, closure_model=ins.smagorinsky_closure_natural(base)
    )
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(9)
        )
    )
    dt = 2e-3
    s_ref = _fast_ref(setup, u0, None, m, dt, 3)

    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True,
        projection_precision="highest", merge=merge,
    )
    assert step.fused and step.merged == merge
    s = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(3):
        s = step(s, dt, theta=jnp.asarray(0.17))
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6


@needs8
@pytest.mark.parametrize("mshape", [(2, 2), (2, 4)])
def test_halo_2d_mesh_pallas(mshape):
    """Per-shard Pallas kernels on 2-D pencil meshes (x/y halo-padded
    blocks, wrapped edge planes discarded), interpreter mode == the
    single-chip fast path (f32)."""
    n = 32
    setup = _setup3d_f32(n)
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(10)
        )
    )
    dt = 5e-3
    s_ref = _fast_ref(setup, u0, None, m, dt, 3)

    ndev = int(np.prod(mshape))
    mesh = make_mesh(mshape, devices=jax.devices()[:ndev])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True, fused=False
    )
    assert step.pallas and not step.fused
    s = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(3):
        s = step(s, dt)
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6


@needs8
def test_solve_unsteady_halo_integration():
    """`solve_unsteady(mesh=..., halo=True)` drives the shard_map halo
    step with the full driver feature set: processors, NaN guard,
    adaptive CFL (psum'd min-reductions via GSPMD), and matches the
    single-device solve."""
    n = 16
    setup = _setup3d(n)
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(11))
    mesh = make_mesh((4,), devices=jax.devices()[:4])

    # fixed dt + processors
    s_ref, out_ref = ins.solve_unsteady(
        setup=setup, ustart=ug, tlims=(0.0, 0.02), dt=2e-3, method=m,
        psolver=ps, processors={"log": ins.timelogger(nupdate=5)},
    )
    s_par, out_par = ins.solve_unsteady(
        setup=setup, ustart=ug, tlims=(0.0, 0.02), dt=2e-3, method=m,
        psolver=ps, mesh=mesh, halo=True,
        processors={"log": ins.timelogger(nupdate=5)},
    )
    assert float(jnp.max(jnp.abs(s_par.u - s_ref.u))) < 1e-11
    # public layout is ghosted and periodic
    un = np.asarray(s_par.u)
    np.testing.assert_allclose(un[:, 0], un[:, -2])

    # adaptive CFL stepping (psum'd reductions) reaches tend
    s_ad, _ = ins.solve_unsteady(
        setup=setup, ustart=ug, tlims=(0.0, 0.01), method=m,
        psolver=ps, mesh=mesh, halo=True, cfl=0.5,
    )
    assert float(s_ad.t) == pytest.approx(0.01, abs=1e-12)
    assert bool(jnp.all(jnp.isfinite(s_ad.u)))

    # NaN guard fires with the halo step too
    with pytest.raises(ins.SolverDivergedError):
        ins.solve_unsteady(
            setup=setup, ustart=jnp.full_like(ug, 1e30),
            tlims=(0.0, 0.02), dt=2e-3, method=m, psolver=ps,
            mesh=mesh, halo=True,
        )


@needs8
def test_halo_no_donation_by_default():
    """donate=False (default): the input state stays usable after a step
    (round-1 use-after-donate footgun removed)."""
    n = 16
    setup = _setup3d(n)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(5))
    u0 = strip_ghosts(ug)
    mesh = make_mesh((4,), devices=jax.devices()[:4])
    step = make_halo_fast_step(setup, method, mesh)
    s0 = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0), n=jnp.asarray(0),
    )
    s1 = step(s0, 1e-3)
    # both live: stepping twice from the same state must give the same u
    s1b = step(s0, 1e-3)
    assert float(jnp.max(jnp.abs(s1.u - s1b.u))) == 0.0


@needs8
@pytest.mark.parametrize("mshape", [(2, 4), (2, 2)])
@pytest.mark.parametrize("method", ["rk44", "lmwray3"])
def test_halo_fused_chain_2d_matches_fastpath(method, mshape):
    """The 2-D pencil FUSED chain (stage kernel with the rectangular
    zero-padded y-basis slice emitting partial y-modes, psum_scatter /
    all_to_all transform schedule, shard-local pass B) in interpreter
    mode == the single-chip fast path (f32)."""
    n = 32
    setup = _setup3d_f32(n)
    ps = ins.psolver_spectral(setup)
    m = ins.RKMethods.RK44() if method == "rk44" else ins.LMWray3()
    u0 = strip_ghosts(
        jax.jit(lambda k: ins.random_field(setup, kp=3, psolver=ps, rng=k))(
            jax.random.PRNGKey(13)
        )
    )
    dt = 5e-3
    s_ref = _fast_ref(setup, u0, None, m, dt, 3)

    ndev = int(np.prod(mshape))
    mesh = make_mesh(mshape, devices=jax.devices()[:ndev])
    step = make_halo_fast_step(
        setup, m, mesh, pallas_interpret=True,
        projection_precision="highest",
    )
    assert step.fused, "2-D fused chain must be selected on the pencil cube"
    s = StepperState(
        u=shard_interior(mesh, u0), temp=None,
        t=jnp.asarray(0.0, jnp.float32), n=jnp.asarray(0),
    )
    for _ in range(3):
        s = step(s, dt)
    assert float(jnp.max(jnp.abs(s.u - s_ref.u))) < 5e-6
