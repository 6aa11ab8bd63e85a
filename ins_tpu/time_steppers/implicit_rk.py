"""Implicit Runge-Kutta stepper.

The reference ships a Newton-based DAE stage solver written against its
removed v1 API (src/time_steppers/step_implicit_runge_kutta.jl, not
callable). This is a TPU-native redesign: the stage system

    u_i = u_0 + dt sum_j A[i, j] f(u_j),   f = P o F o BC  (projected RHS)

is solved by fixed-point (Picard) iteration over stacked stages inside a
`lax.fori_loop` — matrix-free, jittable, differentiable, no Jacobian
assembly (a Newton solve does not map to TPU without one).

IMPORTANT: Picard iteration converges only in the contraction regime
`dt * ||df/du|| < 1` — roughly the *explicit* stability limit. Use this
stepper for its structure (e.g. Gauss methods' energy conservation at
moderate dt), NOT for stiffness; for stiff diffusion use
`AdamsBashforthCrankNicolsonMethod`, whose implicit-diffusion CG solve is
unconditionally stable. The final state gets a projection and BC fill
like the explicit steppers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..boundary_conditions import apply_bc_u
from ..ops.pressure import project
from ..sciml import right_hand_side
from .step import StepperState

__all__ = ["timestep_irk"]


def timestep_irk(method, state, dt, *, setup, psolver, theta=None, niter=10):
    """One implicit-RK step (Gauss/Radau/Lobatto/DIRK tableaus from
    `RKMethods`)."""
    u0, temp, t0, n = state
    assert temp is None, "Implicit RK does not support the temperature equation"
    A = jnp.asarray(method.A, setup.dtype)
    b = jnp.asarray(method.b, setup.dtype)
    c = jnp.asarray(method.c, setup.dtype)
    s = len(method.b)

    def f(u, ti):
        return right_hand_side(u, setup, psolver, ti, theta=theta)

    ts = t0 + c * dt

    def stage_rhs(U):
        # U: (s, D, *N) -> K: (s, D, *N)
        return jnp.stack([f(U[i], ts[i]) for i in range(s)])

    def body(_, U):
        K = stage_rhs(U)
        incr = jnp.tensordot(A, K, axes=([1], [0]))  # (s, D, *N)
        return u0[None] + dt * incr

    U0 = jnp.broadcast_to(u0, (s, *u0.shape))
    U = jax.lax.fori_loop(0, niter, body, U0)
    K = stage_rhs(U)
    u1 = u0 + dt * jnp.tensordot(b, K, axes=([0], [0]))

    t1 = t0 + dt
    u1 = apply_bc_u(u1, t1, setup)
    u1 = project(u1, setup, psolver=psolver)
    u1 = apply_bc_u(u1, t1, setup)
    return StepperState(u=u1, temp=None, t=t1, n=n + 1)
