"""ODE right-hand-side bridge.

Re-design of IncompressibleNavierStokes.jl `src/sciml.jl`: a single pure
`right_hand_side(u, setup, psolver, t)` computing `du/dt = P F(u)` (projected
momentum RHS) for use with external ODE integrators (diffrax-style) or
custom loops; `create_right_hand_side` binds setup/psolver. The reference's
hand-written Enzyme adjoint chain (sciml.jl:50-113) is unnecessary: this
function is JAX-differentiable end to end.
"""

from __future__ import annotations

import jax.numpy as jnp

from .boundary_conditions import apply_bc_u
from .ops.operators import momentum
from .ops.pressure import project

__all__ = ["create_right_hand_side", "right_hand_side"]


def right_hand_side(u, setup, psolver, t, *, theta=None):
    """du/dt = P(F(u)): BC fill, momentum, closure, Leray projection
    (reference create_right_hand_side, src/sciml.jl:13-31)."""
    u = apply_bc_u(u, t, setup)
    F = momentum(u, None, t, setup)
    if setup.closure_model is not None:
        F = F + setup.closure_model(u, theta)
    F = apply_bc_u(F, t, setup, dudt=True)
    return project(F, setup, psolver=psolver)


def create_right_hand_side(setup, psolver):
    """Bind `(u, t) -> du/dt` (diffrax-compatible as
    `lambda t, u, args: f(u, t)`)."""

    def f(u, t, theta=None):
        return right_hand_side(u, setup, psolver, jnp.asarray(t, setup.dtype), theta=theta)

    return f
