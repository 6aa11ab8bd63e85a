"""Smagorinsky closure and tensor-basis tests (mirrors reference smoke
tests in test/operators.jl:162-220 and adds an LES solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins


def test_smagorinsky_closures(case_setup_u):
    setup, u = case_setup_u
    for make in (ins.smagorinsky_closure, ins.smagorinsky_closure_natural):
        m = make(setup)
        s = m(u, jnp.asarray(0.1, setup.dtype))
        assert s.shape == u.shape
        assert not np.any(np.isnan(s))
        # theta = 0 -> zero stress
        s0 = m(u, jnp.asarray(0.0, setup.dtype))
        assert float(jnp.max(jnp.abs(s0))) == 0.0


@pytest.fixture(params=["2d", "3d"])
def case_setup_u(request, setup2d, setup3d, u2d, u3d):
    if request.param == "2d":
        return setup2d, u2d
    return setup3d, u3d


def test_smagorinsky_dissipative():
    """The Smagorinsky term must extract kinetic energy on a periodic box."""
    n = 32
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float64)
    u = ins.random_field(setup, kp=5, rng=jax.random.PRNGKey(2))
    m = ins.smagorinsky_closure_natural(setup)
    s = m(u, jnp.asarray(0.17, setup.dtype))
    from ins_tpu.ops._stencil import seg, slc

    g = setup.grid
    total = 0.0
    for a in range(g.dim):
        box = g.Iu[a]
        om = 1.0
        for b in range(g.dim):
            om = om * seg(g.delta_u[b] if a == b else g.delta[b], box, b)
        total += float(jnp.sum(u[(a,) + slc(box)] * om * s[(a,) + slc(box)]))
    assert total < 0  # net energy extraction


def test_les_solve_runs():
    n = 32
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(
        x=x,
        boundary_conditions=bc,
        Re=1e4,
        closure_model=lambda u, th: ins.smagorinsky_closure_natural(setup0)(u, th),
        dtype=jnp.float64,
    )
    # closure needs a setup; rebuild with self-reference via natural form
    setup0 = ins.Setup(x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float64)
    u0 = ins.random_field(setup0, kp=5, rng=jax.random.PRNGKey(0))
    state, _ = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.05),
        dt=5e-3,
        theta=jnp.asarray(0.1, jnp.float64),
    )
    assert not np.any(np.isnan(state.u))


def test_tensorbasis(case_setup_u):
    setup, u = case_setup_u
    B, V = ins.tensorbasis(u, setup)
    D = setup.grid.dim
    nb, nv = (3, 2) if D == 2 else (11, 5)
    assert B.shape == (nb, *setup.grid.N, D, D)
    assert V.shape == (nv, *setup.grid.N)
    assert not np.any(np.isnan(B))
    assert not np.any(np.isnan(V))
    # B[0] is the identity on the DOF box
    from ins_tpu.ops._stencil import slc

    ip = slc(setup.grid.Ip)
    eye = np.asarray(B[0][ip])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(D), eye.shape))
    # symmetry: B[1] = S is symmetric
    S = np.asarray(B[1])
    np.testing.assert_allclose(S, np.swapaxes(S, -1, -2), atol=1e-12)


def test_lastdimcontract_and_grad(setup2d, u2d):
    setup, u = setup2d, u2d
    B, V = ins.tensorbasis(u, setup)
    a = jnp.stack([V[0] * 0 + 1, V[1], V[0]])
    tau = ins.lastdimcontract(a, B)
    assert tau.shape == B.shape[1:]

    # Gradient flows through tensorbasis (the reference's 3D adjoint is
    # TODO; here autodiff covers it)
    def loss(u):
        B, V = ins.tensorbasis(u, setup)
        return jnp.sum(B[1] ** 2) + jnp.sum(V[0])

    g = jax.grad(loss)(u)
    assert not np.any(np.isnan(g))


def test_tensorbasis_grad_3d(setup3d, u3d):
    def loss(u):
        B, V = ins.tensorbasis(u, setup3d)
        return jnp.sum(B[5] ** 2) + jnp.sum(V[3])

    g = jax.grad(loss)(u3d)
    assert not np.any(np.isnan(g))


def test_natural_closure_interior_twin_matches_ghosted():
    """The ghost-free interior Smagorinsky (fast-path form) must equal
    the ghosted natural closure on uniform periodic grids — the wrap of
    periodic strain/viscosity/stress ghosts makes both the consistent
    staggered form on the torus."""
    from ins_tpu.ops.eddyviscosity import (
        smagorinsky_closure_natural,
        smagorinsky_natural_interior,
    )
    from ins_tpu.ops.fastpath import reghost, strip_ghosts

    for D in (2, 3):
        n = 12
        x = (np.linspace(0, 2 * np.pi, n + 1),) * D
        bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * D
        setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float64)
        dxs = tuple(
            float(np.asarray(setup.grid.delta[d])[0]) for d in range(D)
        )
        rng = np.random.default_rng(1)
        u_int = jnp.asarray(rng.standard_normal((D,) + (n,) * D))
        cl = smagorinsky_closure_natural(setup)
        assert getattr(cl, "kind", None) == "smagorinsky_natural"
        ref = strip_ghosts(cl(reghost(u_int), 0.17))
        got = smagorinsky_natural_interior(u_int, 0.17, dxs)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(ref - got))) < 1e-12 * scale


def test_fastpath_les_3d_dissipates():
    """3D LES through solve_unsteady on the fast path: tagged closure is
    dispatched to the interior twin; energy decays faster than no-model."""
    import jax

    from ins_tpu.ops.pressure import psolver_spectral

    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    base = ins.Setup(x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float64)
    les = ins.Setup(
        x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float64,
        closure_model=ins.smagorinsky_closure_natural(base),
    )
    ps = psolver_spectral(base)
    u0 = ins.random_field(base, kp=4, rng=jax.random.PRNGKey(2))
    th = jnp.asarray(0.17, jnp.float64)
    s_les, _ = ins.solve_unsteady(
        setup=les, ustart=u0, tlims=(0, 0.05), dt=1e-2,
        psolver=psolver_spectral(les), theta=th,
    )
    s_nom, _ = ins.solve_unsteady(
        setup=base, ustart=u0, tlims=(0, 0.05), dt=1e-2, psolver=ps
    )
    E = lambda s: float(ins.total_kinetic_energy(s.u, base))
    E0 = float(ins.total_kinetic_energy(u0, base))
    assert E(s_les) < E(s_nom) < E0
