"""Grid generator and metadata tests (mirrors reference test/grid.jl)."""

import numpy as np
import pytest

import ins_tpu as ins


def test_cosine_grid():
    a, b, N = 1.2, 4.5, 76
    x = ins.cosine_grid(a, b, N)
    assert len(x) == N + 1
    assert x[0] == pytest.approx(a)
    assert x[-1] == pytest.approx(b)
    assert np.all(np.diff(x) > 0)
    # Refined at both ends
    dx = np.diff(x)
    assert dx[0] < dx[N // 2]
    assert dx[-1] < dx[N // 2]


def test_stretched_grid_uniform():
    a, b, N = 0.1, 9.1, 123
    x = ins.stretched_grid(a, b, N, 1.0)
    assert len(x) == N + 1
    assert np.allclose(np.diff(x), (b - a) / N)


def test_stretched_grid_stretched():
    a, b, N, s = 0.1, 9.1, 123, 1.01
    x = ins.stretched_grid(a, b, N, s)
    assert x[0] == pytest.approx(a)
    assert x[-1] == pytest.approx(b)
    dx = np.diff(x)
    assert np.allclose(dx[1:] / dx[:-1], s)


def test_stretched_grid_error():
    with pytest.raises(ValueError):
        ins.stretched_grid(0, 1, 10, -2)


def test_tanh_grid():
    a, b, N, g = 0.1, 3.0, 64, 1.5
    x = ins.tanh_grid(a, b, N, g)
    assert x[0] == pytest.approx(a)
    assert x[-1] == pytest.approx(b)
    assert np.all(np.diff(x) > 0)
    dx = np.diff(x)
    assert dx[0] < dx[N // 2]
    assert dx[-1] < dx[N // 2]


def test_grid_metadata_periodic():
    import jax.numpy as jnp

    n = 8
    x = (np.linspace(0, 1, n + 1), np.linspace(0, 1, n + 1))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    g = ins.make_grid(x=x, boundary_conditions=bc, dtype=jnp.float64)
    assert g.N == (n + 2, n + 2)
    assert g.Np == (n, n)
    assert g.Ip == ((1, n + 1), (1, n + 1))
    assert all(g.periodic) and all(g.uniform)
    # Ghost coordinates continue the uniform spacing
    assert np.allclose(np.diff(np.asarray(g.x[0])), 1 / n)


def test_grid_metadata_mixed():
    import jax.numpy as jnp

    n = 8
    x = (np.linspace(0, 1, n + 1), np.linspace(0, 1, n + 1))
    bc = (
        (ins.DirichletBC(), ins.PressureBC()),
        (ins.SymmetricBC(), ins.SymmetricBC()),
    )
    g = ins.make_grid(x=x, boundary_conditions=bc, dtype=jnp.float64)
    # Dirichlet left: 1 thin ghost; PressureBC right: 1 thin ghost
    assert g.N[0] == n + 2
    # Symmetric: one ghost each side
    assert g.N[1] == n + 2
    # u[0] normal to dim 0: Dirichlet left loses 1, PressureBC right loses 1
    assert g.Iu[0][0] == (1, n + 1)
    # pressure DOFs in dim 0: left offset 1, right (PressureBC) offset 1
    assert g.Ip[0] == (1, n + 1)


def test_max_size(setup2d):
    assert ins.max_size(setup2d.grid) > 0
