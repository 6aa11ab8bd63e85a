"""Boundary-condition ghost-fill tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins


def _setup_periodic(n=8):
    x = (np.linspace(0, 1, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)


def test_periodic_wrap():
    setup = _setup_periodic()
    g = setup.grid
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (2, *g.N), setup.dtype)
    u = ins.apply_bc_u(u, jnp.asarray(0.0), setup)
    un = np.asarray(u)
    N = g.N
    # ghost left = last interior; ghost right = first interior
    np.testing.assert_allclose(un[:, 0, :], un[:, N[0] - 2, :])
    np.testing.assert_allclose(un[:, N[0] - 1, :], un[:, 1, :])
    np.testing.assert_allclose(un[:, :, 0], un[:, :, N[1] - 2])
    np.testing.assert_allclose(un[:, :, N[1] - 1], un[:, :, 1])


def test_dirichlet_velocity_values():
    n = 8
    x = (np.linspace(0, 1, n + 1),) * 2
    ub = lambda dim, x, y, t: (dim == 0) * (1.0 + 0 * x) + (dim == 1) * 0.0
    bc0 = (ins.DirichletBC(ub), ins.DirichletBC(ub))
    bc1 = (ins.DirichletBC(), ins.DirichletBC())
    setup = ins.Setup(
        x=x, boundary_conditions=(bc0, bc1), dtype=jnp.float64
    )
    g = setup.grid
    u = jnp.ones((2, *g.N), setup.dtype) * 0.5
    u = ins.apply_bc_u(u, jnp.asarray(0.0), setup)
    un = np.asarray(u)
    # u[0] on the left boundary plane of dim 0 equals 1 (corners are
    # overwritten by the later dim-1 no-slip fill: BCs apply
    # dimension-sequentially, as in the reference)
    s, e = g.Iu[0][0]
    assert np.allclose(un[0, s - 1, 1:-1], 1.0)
    assert np.allclose(un[0, e, 1:-1], 1.0)
    # no-slip on dim-1 boundaries for u[0]: ghost plane set to 0
    s1, e1 = g.Iu[0][1]
    assert np.allclose(un[0, :, s1 - 1], 0.0)


def test_symmetric_and_pressure_bc():
    n = 8
    x = (np.linspace(0, 1, n + 1),) * 2
    bc = (
        (ins.SymmetricBC(), ins.SymmetricBC()),
        (ins.DirichletBC(), ins.PressureBC()),
    )
    setup = ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)
    g = setup.grid
    key = jax.random.PRNGKey(1)
    u = jax.random.normal(key, (2, *g.N), setup.dtype)
    u = ins.apply_bc_u(u, jnp.asarray(0.0), setup)
    un = np.asarray(u)
    # Symmetric dim 0: normal component zero on boundary planes of Iu[0]
    s, e = g.Iu[0][0]
    assert np.allclose(un[0, s - 1, :], 0.0)
    assert np.allclose(un[0, e, :], 0.0)
    # tangential component mirrored
    s1, e1 = g.Iu[1][0]
    np.testing.assert_allclose(un[1, s1 - 1, :], un[1, s1, :])
    # PressureBC (dim 1 right): zero-Neumann velocity (copy inward)
    s2, e2 = g.Iu[0][1]
    np.testing.assert_allclose(un[0, :, e2], un[0, :, e2 - 1])
    # p ghost = 0 on pressure boundary
    p = jax.random.normal(key, g.N, setup.dtype)
    p = ins.apply_bc_p(p, jnp.asarray(0.0), setup)
    pn = np.asarray(p)
    sp, ep = g.Ip[1]
    assert np.allclose(pn[:, ep], 0.0)


def test_temperature_dirichlet():
    setup2d = None
    n = 8
    x = (np.linspace(0, 1, n + 1),) * 2
    bc = ((ins.DirichletBC(), ins.DirichletBC()),) * 2
    tbc = (
        (ins.DirichletBC(1.0), ins.DirichletBC(0.0)),
        (ins.SymmetricBC(), ins.SymmetricBC()),
    )
    temp_eq = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=1.0, boundary_conditions=tbc, dtype=jnp.float64
    )
    setup = ins.Setup(
        x=x, boundary_conditions=bc, temperature=temp_eq, dtype=jnp.float64
    )
    temp = ins.temperaturefield(setup, lambda x, y: 0 * x + 0.5)
    tn = np.asarray(temp)
    g = setup.grid
    s, e = g.Ip[0]
    assert np.allclose(tn[s - 1, 1:-1], 1.0)
    assert np.allclose(tn[e, 1:-1], 0.0)


def test_bc_differentiable(setup2d, u2d):
    """Gradients flow through the BC fills (replaces reference hand-written
    pullbacks, boundary_conditions.jl:114-157)."""
    setup = setup2d

    def loss(u):
        ub = ins.apply_bc_u(u, jnp.asarray(0.0, setup.dtype), setup)
        return jnp.sum(ub**2)

    gr = jax.grad(loss)(u2d)
    assert not np.any(np.isnan(gr))
    # finite-difference check on one interior entry
    eps = 1e-6
    idx = (0, 5, 5)
    up = u2d.at[idx].add(eps)
    um = u2d.at[idx].add(-eps)
    fd = (loss(up) - loss(um)) / (2 * eps)
    assert float(gr[idx]) == pytest.approx(float(fd), rel=1e-4)
