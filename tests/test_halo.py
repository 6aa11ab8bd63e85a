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
