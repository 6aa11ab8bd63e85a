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

from .boundary_conditions import apply_bc_temp, apply_bc_u
from .ops.operators import momentum
from .ops.pressure import project
from .time_steppers.step import _temp_rhs

__all__ = ["create_right_hand_side", "right_hand_side"]


def right_hand_side(u, setup, psolver, t, *, theta=None, temp=None):
    """du/dt = P(F(u)): BC fill, momentum, closure, Leray projection
    (reference create_right_hand_side, src/sciml.jl:13-31).

    With ``temp`` (Boussinesq setups), returns ``(du/dt, dtemp/dt)`` —
    buoyancy enters the momentum RHS and the temperature RHS carries
    convection-diffusion (+ dissipation when enabled), matching the ERK
    stepper's stage evaluation.  The reference bridge is momentum-only;
    this extension closes that gap for diffrax users of RB flows.
    """
    u = apply_bc_u(u, t, setup)
    if temp is not None:
        temp = apply_bc_temp(temp, t, setup)
    F = momentum(u, temp, t, setup)
    if setup.closure_model is not None:
        F = F + setup.closure_model(u, theta)
    F = apply_bc_u(F, t, setup, dudt=True)
    du = project(F, setup, psolver=psolver)
    if temp is None:
        return du
    return du, _temp_rhs(u, temp, setup)


def create_right_hand_side(setup, psolver):
    """Bind `(u, t) -> du/dt` (diffrax-compatible as
    `lambda t, u, args: f(u, t)`); pass ``temp=`` for Boussinesq state."""

    def f(u, t, theta=None, temp=None):
        return right_hand_side(
            u, setup, psolver, jnp.asarray(t, setup.dtype),
            theta=theta, temp=temp,
        )

    return f
