"""Staggered Cartesian grid metadata.

TPU-native re-design of IncompressibleNavierStokes.jl `src/grid.jl:100-276`.
All 1-D metadata arrays (coordinates, widths, interpolation weights) are
precomputed with numpy at setup time and stored as JAX arrays (pytree
children); index ranges (`Iu`, `Ip`) are static 0-based half-open boxes
resolved at trace time into static slices.

Conventions (0-based): `x[d]` has `N[d]+1` volume-boundary coordinates
(ghosts included); volume `i` spans `[x[i], x[i+1]]`; the `u[alpha]`
component at index `I` sits on the *right* face of volume `I` in direction
`alpha` (reference `src/operators.jl:13-27`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ._pytree import pytree_dataclass, static_field
from .boundary_conditions import (
    DirichletBC,
    PeriodicBC,
    PressureBC,
    offset_p,
    offset_u,
    padghost,
)

__all__ = [
    "Grid",
    "make_grid",
    "stretched_grid",
    "cosine_grid",
    "tanh_grid",
    "max_size",
]


# --------------------------------------------------------------------------
# 1-D grid generators (reference: src/grid.jl:39-77)
# --------------------------------------------------------------------------


def cosine_grid(a, b, N):
    """Nonuniform grid of N+1 points on [a, b] with a cosine profile."""
    i = np.arange(N + 1, dtype=np.float64)
    return a + (b - a) * (1 - np.cos(np.pi * i / N)) / 2


def stretched_grid(a, b, N, s=1.0):
    """Grid of N+1 points on [a, b] with per-cell stretch factor `s`."""
    if s <= 0:
        raise ValueError("The stretch factor must be positive")
    if abs(s - 1.0) < 1e-12:
        return np.linspace(a, b, N + 1)
    i = np.arange(N + 1, dtype=np.float64)
    return a + (b - a) * (1 - s**i) / (1 - s**N)


def tanh_grid(a, b, N, gamma=1.0):
    """Grid of N+1 points on [a, b], Trias et al. tanh refinement."""
    x = np.linspace(0.0, 1.0, N + 1)
    return a + (b - a) * (1 + np.tanh(gamma * (2 * x - 1)) / np.tanh(gamma)) / 2


def max_size(grid) -> float:
    """Size of the largest grid element (reference src/grid.jl:22-26)."""
    m = [float(np.max(np.asarray(d))) for d in grid.delta]
    return float(np.sqrt(np.sum(np.square(m))))


# --------------------------------------------------------------------------
# Grid
# --------------------------------------------------------------------------


@pytree_dataclass
class Grid:
    # --- static metadata ---
    dim: int = static_field()
    N: tuple = static_field()  # volumes per dim, incl. ghosts
    Nu: tuple = static_field()  # Nu[alpha][beta]: u[alpha] DOF count per dim
    Np: tuple = static_field()  # pressure DOF count per dim
    Iu: tuple = static_field()  # Iu[alpha]: box of u[alpha] DOFs
    Ip: tuple = static_field()  # box of pressure DOFs
    xlims: tuple = static_field()  # physical domain limits per dim
    periodic: tuple = static_field()  # per-dim: both sides periodic?
    uniform: tuple = static_field()  # per-dim: uniform spacing (interior)?

    # --- array metadata (pytree children) ---
    x: tuple  # x[d]: N[d]+1 volume boundary coords (ghosts included)
    xu: tuple  # xu[alpha][beta]: coords of u[alpha] points along dim beta
    xp: tuple  # xp[d]: pressure point coords
    delta: tuple  # delta[d]: volume widths (clamped at eps)
    delta_u: tuple  # delta_u[d]: distance between pressure points
    A: tuple  # A[alpha][beta] = (A1, A2): face interpolation weights
    lap_c: tuple  # lap_c[d] = (cl, cc, cr): BC-aware Laplacian row coeffs
    plap_diag: tuple  # plap_diag[d]: unmodified center coeff (preconditioner)


def make_grid(*, x, boundary_conditions, dtype=jnp.float32) -> Grid:
    """Build staggered-grid metadata (reference `Grid`, src/grid.jl:100-276)."""
    np_dtype = np.dtype(dtype)
    eps = float(np.finfo(np_dtype).eps)
    # Uniformity detection in float64 (working-precision coordinate
    # rounding would mis-flag large uniform grids as stretched)
    x64 = [np.asarray(xd, dtype=np.float64) for xd in x]
    uniform = tuple(
        bool(np.allclose(np.diff(xd), np.diff(xd)[0], rtol=1e-8))
        for xd in x64
    )
    x = [np.asarray(xd, dtype=np_dtype).copy() for xd in x]
    xlims = tuple((float(xd[0]), float(xd[-1])) for xd in x)
    D = len(x)
    if D not in (2, 3):
        raise ValueError("Only 2D and 3D grids are supported")

    # Ghost coordinates
    for d in range(D):
        bcl, bcr = boundary_conditions[d]
        if isinstance(bcl, PeriodicBC) != isinstance(bcr, PeriodicBC):
            raise ValueError("PeriodicBC must be used on both sides")
        x[d] = padghost(bcl, x[d], False)
        x[d] = padghost(bcr, x[d], True)

    N = tuple(len(xd) - 1 for xd in x)

    # DOF counts and index boxes (0-based half-open)
    def u_range(alpha, beta):
        na = offset_u(boundary_conditions[beta][0], False, alpha == beta)
        nb = offset_u(boundary_conditions[beta][1], True, alpha == beta)
        return (na, N[beta] - nb)

    def p_range(d):
        na = offset_p(boundary_conditions[d][0], False)
        nb = offset_p(boundary_conditions[d][1], True)
        return (na, N[d] - nb)

    Iu = tuple(tuple(u_range(a, b) for b in range(D)) for a in range(D))
    Ip = tuple(p_range(d) for d in range(D))
    Nu = tuple(tuple(e - s for (s, e) in Iu[a]) for a in range(D))
    Np = tuple(e - s for (s, e) in Ip)

    # Velocity / pressure point coordinates
    xu = tuple(
        tuple(
            x[b][1:] if a == b else (x[b][:-1] + x[b][1:]) / 2 for b in range(D)
        )
        for a in range(D)
    )
    xp = tuple((xd[:-1] + xd[1:]) / 2 for xd in x)

    # Volume widths; infinitely thin widths clamped at eps to avoid div by 0
    delta = tuple(np.maximum(np.diff(xd), eps) for xd in x)
    delta_u = tuple(
        np.maximum(np.append(np.diff(xp[d]), delta[d][-1] / 2), eps)
        for d in range(D)
    )

    # Interpolation weights A[alpha][beta] = (A1, A2)
    # (reference src/grid.jl:226-248)
    A = []
    for a in range(D):
        Arow = []
        for b in range(D):
            if a == b:
                A1 = np.full(N[a], 0.5, np_dtype)
                A1[0] = 1.0
                A2 = np.full(N[a], 0.5, np_dtype)
                A2[-1] = 1.0
            else:
                # raw[j] = (x[b][j+1] - xp[b][j]) / delta_u[b][j], j = 0..N-2
                raw = (x[b][1:-1] - xp[b][:-1]) / delta_u[b][:-1]
                A1 = np.concatenate(([1.0], 1.0 - raw)).astype(np_dtype)
                A2 = np.concatenate((raw, [1.0])).astype(np_dtype)
            Arow.append((A1, A2))
        A.append(tuple(Arow))
    A = tuple(A)

    # BC-aware Laplacian row coefficients over the pressure DOF range
    # (reference laplacian! at src/operators.jl:328-352): per dim d, for
    # pressure index i in [Ip[d]), the 1-D part of the Laplacian row is
    #   cl[i] p[i-1] + cc[i] p[i] + cr[i] p[i+1]
    # scaled later by Omega_I / delta[d][i].
    lap_c = []
    plap_diag = []
    for d in range(D):
        s, e = Ip[d]
        idx = np.arange(s, e)
        du = delta_u[d]
        cr = 1.0 / du[idx]
        cl = 1.0 / du[idx - 1]
        cc = -(cr + cl)
        plap_diag.append(cc.astype(np_dtype).copy())
        bcl, bcr = boundary_conditions[d]
        if isinstance(bcl, PressureBC):
            cl[0] = 0.0  # ghost pressure is 0; row keeps both center terms
        elif isinstance(bcl, DirichletBC):
            cl[0] = 0.0
            cc[0] = -1.0 / du[s]
        if isinstance(bcr, PressureBC):
            cr[-1] = 0.0
        elif isinstance(bcr, DirichletBC):
            cr[-1] = 0.0
            cc[-1] = -1.0 / du[e - 2]
        lap_c.append(
            (cl.astype(np_dtype), cc.astype(np_dtype), cr.astype(np_dtype))
        )
    lap_c = tuple(lap_c)
    plap_diag = tuple(plap_diag)

    periodic = tuple(
        isinstance(boundary_conditions[d][0], PeriodicBC) for d in range(D)
    )

    def dev(a):
        return jnp.asarray(a, dtype=dtype)

    def devtree(t):
        if isinstance(t, tuple):
            return tuple(devtree(v) for v in t)
        return dev(t)

    return Grid(
        dim=D,
        N=N,
        Nu=Nu,
        Np=Np,
        Iu=Iu,
        Ip=Ip,
        xlims=xlims,
        periodic=periodic,
        uniform=uniform,
        x=devtree(tuple(x)),
        xu=devtree(xu),
        xp=devtree(xp),
        delta=devtree(delta),
        delta_u=devtree(delta_u),
        A=devtree(A),
        lap_c=devtree(lap_c),
        plap_diag=devtree(plap_diag),
    )
