"""Gradient correctness vs finite differences.

Mirrors reference test/chainrules.jl: every differentiable operator's
reverse-mode gradient is validated against central finite differences,
for all four BC types and on 2D/3D stretched grids. In the reference these
validate ~30 hand-written rrule/Enzyme adjoints; here they validate the
single JAX autodiff path (including the custom VJPs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.pressure import poisson, psolver_cg, psolver_spectral


def _fd_check(f, x, seed=0, eps=1e-6, rtol=2e-5, nprobe=5):
    """Compare <grad f, v> with central differences along random probes."""
    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    key = jax.random.PRNGKey(seed)
    for i in range(nprobe):
        key, k = jax.random.split(key)
        v = jax.random.normal(k, x.shape, x.dtype)
        v = v / jnp.linalg.norm(v)
        fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
        ad = jnp.sum(g * v)
        np.testing.assert_allclose(
            float(ad), float(fd), rtol=rtol, atol=1e-10
        )


def _setups():
    cases = {}
    # All four BC families on stretched 2D grids
    bcs = {
        "periodic": ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2,
        "dirichlet": ((ins.DirichletBC(), ins.DirichletBC()),) * 2,
        "symmetric": ((ins.SymmetricBC(), ins.SymmetricBC()),) * 2,
        "pressure": (
            (ins.DirichletBC(), ins.PressureBC()),
            (ins.PressureBC(), ins.PressureBC()),
        ),
    }
    for name, bc in bcs.items():
        n = 8
        if name == "periodic":
            x = (np.linspace(0.0, 1.0, n + 1),) * 2
        else:
            x = (
                ins.stretched_grid(0.0, 1.0, n, 1.1),
                ins.cosine_grid(0.0, 1.0, n),
            )
        cases[name] = ins.Setup(
            x=x, boundary_conditions=bc, Re=500.0, dtype=jnp.float64
        )
    return cases


SETUPS = _setups()


@pytest.fixture(params=list(SETUPS))
def bc_setup(request):
    return SETUPS[request.param]


def _rand_u(setup, seed=1):
    g = setup.grid
    u = jax.random.normal(jax.random.PRNGKey(seed), (g.dim, *g.N), setup.dtype)
    return ins.apply_bc_u(u, jnp.asarray(0.0), setup)


def _rand_p(setup, seed=2):
    g = setup.grid
    p = jax.random.normal(jax.random.PRNGKey(seed), g.N, setup.dtype)
    return ins.apply_bc_p(p, jnp.asarray(0.0), setup)


def test_apply_bc_u_grad(bc_setup):
    setup = bc_setup
    u = _rand_u(setup)
    _fd_check(
        lambda u: jnp.sum(jnp.sin(ins.apply_bc_u(u, jnp.asarray(0.0), setup))),
        u,
    )


def test_apply_bc_p_grad(bc_setup):
    setup = bc_setup
    p = _rand_p(setup)
    _fd_check(
        lambda p: jnp.sum(jnp.cos(ins.apply_bc_p(p, jnp.asarray(0.0), setup))),
        p,
    )


def test_divergence_grad(bc_setup):
    setup = bc_setup
    u = _rand_u(setup)
    _fd_check(lambda u: jnp.sum(ins.divergence(u, setup) ** 2), u)


def test_pressuregradient_grad(bc_setup):
    setup = bc_setup
    p = _rand_p(setup)
    _fd_check(lambda p: jnp.sum(ins.pressuregradient(p, setup) ** 2), p)


def test_convection_grad(bc_setup):
    setup = bc_setup
    u = _rand_u(setup)
    _fd_check(lambda u: jnp.sum(ins.convection(u, setup) ** 2), u)


def test_diffusion_grad(bc_setup):
    setup = bc_setup
    u = _rand_u(setup)
    _fd_check(lambda u: jnp.sum(ins.diffusion(u, setup) ** 2), u)


def test_laplacian_grad(bc_setup):
    setup = bc_setup
    p = _rand_p(setup)
    _fd_check(lambda p: jnp.sum(ins.laplacian(p, setup) ** 2), p)


def test_momentum_grad(bc_setup):
    setup = bc_setup
    u = _rand_u(setup)
    _fd_check(
        lambda u: jnp.sum(
            ins.momentum(u, None, jnp.asarray(0.0, setup.dtype), setup) ** 2
        ),
        u,
    )


def test_poisson_selfadjoint_vjp(bc_setup):
    """The self-adjoint Poisson custom-VJP (reference rrule,
    src/pressure.jl:18-19) against finite differences through the solver."""
    setup = bc_setup
    psolve = (
        psolver_spectral(setup)
        if all(setup.grid.periodic)
        else psolver_cg(setup, reltol=1e-13)
    )
    u = _rand_u(setup, 3)

    def f(u):
        div = ins.scalewithvolume(ins.divergence(u, setup), setup)
        p = poisson(psolve, div)
        return jnp.sum(p * div)

    _fd_check(f, u, rtol=1e-4)


def test_project_grad(bc_setup):
    setup = bc_setup
    psolve = (
        psolver_spectral(setup)
        if all(setup.grid.periodic)
        else psolver_cg(setup, reltol=1e-13)
    )
    u = _rand_u(setup, 4)
    _fd_check(
        lambda u: jnp.sum(ins.project(u, setup, psolver=psolve) ** 2),
        u,
        rtol=1e-4,
    )


def test_timestep_grad_wrt_theta():
    """Gradient through a full RK44 step w.r.t. closure parameters — the
    core requirement of a-posteriori training (reference chains rrules
    through timestep, training.jl:116-141)."""
    from ins_tpu.time_steppers.step import StepperState, timestep

    n = 8
    x = (np.linspace(0.0, 1.0, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    closure = lambda u, th: th["a"] * u + th["b"] * u**2
    setup = ins.Setup(
        x=x, boundary_conditions=bc, Re=500.0, closure_model=closure,
        dtype=jnp.float64,
    )
    ps = psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=2, rng=jax.random.PRNGKey(0))
    th = {"a": jnp.asarray(0.1, jnp.float64), "b": jnp.asarray(0.05, jnp.float64)}

    def loss(th):
        s = StepperState(
            u=u0, temp=None, t=jnp.asarray(0.0, jnp.float64), n=jnp.asarray(0)
        )
        s = timestep(
            ins.RKMethods.RK44(), s, jnp.asarray(1e-2), setup=setup,
            psolver=ps, theta=th,
        )
        return jnp.sum(s.u**2)

    g = jax.grad(loss)(th)
    eps = 1e-6
    for k in ("a", "b"):
        thp = dict(th); thp[k] = th[k] + eps
        thm = dict(th); thm[k] = th[k] - eps
        fd = (loss(thp) - loss(thm)) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-5)


def test_temperature_terms_grad():
    """Gradients of the Boussinesq terms (reference dissipation/gravity
    pullbacks, src/operators.jl:740-931)."""
    setup2d = SETUPS["dirichlet"]
    tbc = ((ins.DirichletBC(1.0), ins.DirichletBC(0.0)),) * 2
    temp_eq = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=1.0, boundary_conditions=tbc, dtype=jnp.float64
    )
    setup = ins.Setup(
        x=(ins.stretched_grid(0, 1, 8, 1.1), ins.cosine_grid(0, 1, 8)),
        boundary_conditions=setup2d.boundary_conditions,
        temperature=temp_eq,
        dtype=jnp.float64,
    )
    u = _rand_u(setup, 5)
    temp = ins.temperaturefield(setup, lambda x, y: x * y)
    _fd_check(
        lambda u: jnp.sum(ins.convection_diffusion_temp(u, temp, setup) ** 2),
        u,
    )
    _fd_check(lambda u: jnp.sum(ins.dissipation(u, setup) ** 2), u)
    _fd_check(
        lambda t: jnp.sum(ins.gravity(t, setup) ** 2), temp, seed=6
    )
