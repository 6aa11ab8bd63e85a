"""Sparse-matrix mirrors vs matrix-free operators
(mirrors reference test/matrices.jl: mixed Periodic x (Dirichlet, Pressure)
x Symmetric stretched grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops import matrices as mats
from ins_tpu.ops._stencil import slc


def _mixed_setup_2d():
    n = 8
    x = (
        np.linspace(0.0, 1.0, n + 1),
        ins.stretched_grid(0.0, 1.0, n, 1.1),
    )
    bc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(), ins.PressureBC()),
    )
    tbc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(1.0), ins.SymmetricBC()),
    )
    temp = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=1.0, boundary_conditions=tbc, dtype=jnp.float64
    )
    return ins.Setup(
        x=x, boundary_conditions=bc, temperature=temp, dtype=jnp.float64
    )


def _mixed_setup_3d():
    n = 6
    x = (
        np.linspace(0.0, 1.0, n + 1),
        ins.stretched_grid(0.0, 1.0, n, 1.15),
        ins.cosine_grid(0.0, 1.0, n),
    )
    bc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(), ins.PressureBC()),
        (ins.SymmetricBC(), ins.SymmetricBC()),
    )
    return ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)


@pytest.fixture(params=["2d", "3d"])
def msetup(request):
    return _mixed_setup_2d() if request.param == "2d" else _mixed_setup_3d()


def _rand_u(setup, seed=0):
    g = setup.grid
    return jax.random.normal(
        jax.random.PRNGKey(seed), (g.dim, *g.N), setup.dtype
    )


def _rand_p(setup, seed=1):
    g = setup.grid
    return jax.random.normal(jax.random.PRNGKey(seed), g.N, setup.dtype)


def test_bc_u_mat(msetup):
    u = _rand_u(msetup)
    ub = ins.apply_bc_u(u, jnp.asarray(0.0), msetup)
    B = mats.bc_u_mat(msetup)
    uvec = B @ np.asarray(u).ravel()
    np.testing.assert_allclose(
        uvec, np.asarray(ub).ravel(), atol=1e-13, rtol=0
    )


def test_bc_p_mat(msetup):
    p = _rand_p(msetup)
    pb = ins.apply_bc_p(p, jnp.asarray(0.0), msetup)
    B = mats.bc_p_mat(msetup)
    pvec = B @ np.asarray(p).ravel()
    np.testing.assert_allclose(
        pvec, np.asarray(pb).ravel(), atol=1e-13, rtol=0
    )


def test_bc_temp_mat():
    setup = _mixed_setup_2d()
    # Homogeneous Dirichlet temp BC for the matrix comparison
    tbc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(), ins.SymmetricBC()),
    )
    temp_eq = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=1.0, boundary_conditions=tbc, dtype=jnp.float64
    )
    setup = ins.Setup(
        x=(np.linspace(0, 1, 9), ins.stretched_grid(0, 1, 8, 1.1)),
        boundary_conditions=setup.boundary_conditions,
        temperature=temp_eq,
        dtype=jnp.float64,
    )
    t = _rand_p(setup, 3)
    tb = ins.apply_bc_temp(t, jnp.asarray(0.0), setup)
    B = mats.bc_temp_mat(setup)
    np.testing.assert_allclose(
        B @ np.asarray(t).ravel(), np.asarray(tb).ravel(), atol=1e-13, rtol=0
    )


def test_divergence_mat(msetup):
    u = ins.apply_bc_u(_rand_u(msetup), jnp.asarray(0.0), msetup)
    div = ins.divergence(u, msetup)
    M = mats.divergence_mat(msetup)
    np.testing.assert_allclose(
        M @ np.asarray(u).ravel(), np.asarray(div).ravel(), atol=1e-11, rtol=0
    )


def test_pressuregradient_mat(msetup):
    p = ins.apply_bc_p(_rand_p(msetup), jnp.asarray(0.0), msetup)
    G = ins.pressuregradient(p, msetup)
    M = mats.pressuregradient_mat(msetup)
    np.testing.assert_allclose(
        M @ np.asarray(p).ravel(), np.asarray(G).ravel(), atol=1e-11, rtol=0
    )


def test_diffusion_mat(msetup):
    u = ins.apply_bc_u(_rand_u(msetup), jnp.asarray(0.0), msetup)
    d = ins.diffusion(u, msetup, use_viscosity=False)
    M = mats.diffusion_mat(msetup)
    np.testing.assert_allclose(
        M @ np.asarray(u).ravel(), np.asarray(d).ravel(), atol=1e-9, rtol=0
    )


def test_laplacian_mat(msetup):
    """laplacian() == laplacian_mat on DOFs (test/operators.jl:90-105)."""
    p = ins.apply_bc_p(_rand_p(msetup), jnp.asarray(0.0), msetup)
    Lp = ins.laplacian(p, msetup)
    L = mats.laplacian_mat(msetup)
    ip = slc(msetup.grid.Ip)
    np.testing.assert_allclose(
        L @ np.asarray(p[ip]).ravel(),
        np.asarray(Lp[ip]).ravel(),
        atol=1e-10,
        rtol=0,
    )


def test_pad_mats(msetup):
    g = msetup.grid
    P = mats.pad_scalarfield_mat(msetup)
    p = _rand_p(msetup)
    inner = np.asarray(p[slc(g.Ip)]).ravel()
    padded = (P @ inner).reshape(g.N)
    np.testing.assert_allclose(padded[slc(g.Ip)].ravel(), inner)
    # Transpose restricts
    np.testing.assert_allclose(P.T @ padded.ravel(), inner)
    Pv = mats.pad_vectorfield_mat(msetup)
    assert Pv.shape[0] == g.dim * int(np.prod(g.N))


def test_psolver_direct_periodic():
    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)
    from ins_tpu.ops.pressure import poisson, psolver_direct, psolver_spectral

    g = setup.grid
    xp, yp = np.meshgrid(
        np.asarray(g.xp[0]), np.asarray(g.xp[1]), indexing="ij"
    )
    p_exact = jnp.asarray(np.sin(xp) * np.cos(yp))
    p_exact = ins.apply_bc_p(p_exact, jnp.asarray(0.0), setup)
    f = ins.laplacian(p_exact, setup)
    p = poisson(psolver_direct(setup), f)
    ip = slc(g.Ip)
    pe = np.asarray(p_exact[ip])
    pn = np.asarray(p[ip])
    pn = pn - pn.mean() + pe.mean()
    assert np.max(np.abs(pn - pe)) < 1e-10


def test_psolver_direct_mixed(msetup):
    """Direct solve on the mixed-BC grid reproduces a manufactured p."""
    from ins_tpu.ops.pressure import poisson, psolver_direct

    g = msetup.grid
    p_ref = ins.apply_bc_p(_rand_p(msetup, 7), jnp.asarray(0.0), msetup)
    f = ins.laplacian(p_ref, msetup)
    p = poisson(psolver_direct(msetup), f)
    ip = slc(g.Ip)
    pe = np.asarray(p_ref[ip])
    pn = np.asarray(p[ip])
    # PressureBC present -> definite operator, unique solution
    assert np.max(np.abs(pn - pe)) < 1e-8
