"""Fast-diagonalization direct Poisson solver: exactness on every BC/grid
combination and inside full solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops._stencil import slc
from ins_tpu.ops.fdm import psolver_fdm
from ins_tpu.ops.pressure import poisson, psolver_cg


CASES = {
    "cavity-stretched": dict(
        x=(ins.cosine_grid(0, 1, 24), ins.tanh_grid(0, 1, 24, 1.3)),
        bc=((ins.DirichletBC(), ins.DirichletBC()),) * 2,
    ),
    "mixed-pressure": dict(
        x=(np.linspace(0, 1, 25), ins.stretched_grid(0, 1, 24, 1.1)),
        bc=(
            (ins.PeriodicBC(), ins.PeriodicBC()),
            (ins.DirichletBC(), ins.PressureBC()),
        ),
    ),
    "symmetric": dict(
        x=(np.linspace(0, 1, 25), ins.cosine_grid(0, 1, 24)),
        bc=((ins.SymmetricBC(), ins.SymmetricBC()),) * 2,
    ),
    "periodic-stretchedless": dict(
        x=(np.linspace(0, 1, 25),) * 2,
        bc=((ins.PeriodicBC(), ins.PeriodicBC()),) * 2,
    ),
    "3d-mixed": dict(
        x=(
            np.linspace(0, 1, 13),
            ins.cosine_grid(0, 1, 12),
            ins.tanh_grid(0, 1, 12, 1.2),
        ),
        bc=(
            (ins.PeriodicBC(), ins.PeriodicBC()),
            (ins.DirichletBC(), ins.DirichletBC()),
            (ins.SymmetricBC(), ins.SymmetricBC()),
        ),
    ),
}


@pytest.mark.parametrize("name", list(CASES))
def test_fdm_exact(name):
    c = CASES[name]
    setup = ins.Setup(x=c["x"], boundary_conditions=c["bc"], dtype=jnp.float64)
    g = setup.grid
    ip = slc(g.Ip)
    p_ref = jax.random.normal(jax.random.PRNGKey(1), g.N)
    p_ref = ins.apply_bc_p(p_ref, jnp.asarray(0.0), setup)
    f = ins.laplacian(p_ref, setup)
    p = poisson(psolver_fdm(setup), f)
    pe, pn = np.asarray(p_ref[ip]), np.asarray(p[ip])
    pn = pn - pn.mean() + pe.mean()
    assert np.max(np.abs(pn - pe)) < 1e-11, name


def test_default_psolver_picks_fdm():
    setup = ins.Setup(
        x=(ins.cosine_grid(0, 1, 16),) * 2,
        boundary_conditions=((ins.DirichletBC(), ins.DirichletBC()),) * 2,
        dtype=jnp.float64,
    )
    ps = ins.default_psolver(setup)
    assert getattr(ps, "is_fdm", False)


def test_cavity_solve_fdm_matches_cg():
    n = 24
    x = (ins.cosine_grid(0.0, 1.0, n),) * 2
    bc = (
        (ins.DirichletBC(), ins.DirichletBC()),
        (ins.DirichletBC(), ins.DirichletBC((1.0, 0.0))),
    )
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float64)
    fdm = psolver_fdm(setup)
    cg = psolver_cg(setup, reltol=1e-13)
    u0 = ins.velocityfield(setup, lambda d, x, y: 0.0 * x, psolver=fdm)
    s1, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.02), dt=1e-3, psolver=fdm
    )
    s2, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.02), dt=1e-3, psolver=cg
    )
    assert float(jnp.max(jnp.abs(s1.u - s2.u))) < 1e-10
    div = ins.divergence(s1.u, setup)
    assert float(jnp.max(jnp.abs(div))) < 1e-11


def test_fdm_gradient():
    """Self-adjoint poisson VJP holds for the FDM solver."""
    setup = ins.Setup(
        x=(ins.cosine_grid(0, 1, 12), ins.tanh_grid(0, 1, 12, 1.2)),
        boundary_conditions=((ins.DirichletBC(), ins.DirichletBC()),) * 2,
        dtype=jnp.float64,
    )
    ps = psolver_fdm(setup)
    u = jax.random.normal(jax.random.PRNGKey(2), (2, *setup.grid.N))
    u = ins.apply_bc_u(u, jnp.asarray(0.0), setup)

    def f(u):
        return jnp.sum(ins.project(u, setup, psolver=ps) ** 2)

    g = jax.grad(f)(u)
    eps = 1e-6
    v = jax.random.normal(jax.random.PRNGKey(3), u.shape)
    v = v / jnp.linalg.norm(v)
    fd = (f(u + eps * v) - f(u - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(g * v)), float(fd), rtol=1e-6)
