"""Time steppers (functional).

Re-design of IncompressibleNavierStokes.jl
`src/time_steppers/step_explicit_runge_kutta.jl` and `step_lmwray3.jl`.
There is a single *pure* `timestep` per method (the reference's in-place /
out-of-place twins collapse into one jitted function — XLA buffer donation
plays the role of the preallocated caches). Differentiability through the
step comes from JAX autodiff plus the self-adjoint Poisson custom-VJP.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from ..boundary_conditions import apply_bc_temp, apply_bc_u
from ..ops.operators import convection_diffusion_temp, dissipation, momentum
from ..ops.pressure import project
from .methods import (
    AdamsBashforthCrankNicolsonMethod,
    ExplicitRungeKuttaMethod,
    ImplicitRungeKuttaMethod,
    LMWray3,
    OneLegMethod,
)


class StepperState(NamedTuple):
    """Carried simulation state (a pytree; `n` is a traced step counter)."""

    u: Any
    temp: Any  # scalar field or None
    t: Any
    n: Any


def create_stepper(method, *, setup, psolver, u, temp=None, t=0.0, n=0):
    if isinstance(method, AdamsBashforthCrankNicolsonMethod):
        from .imex import create_stepper_abcn

        return create_stepper_abcn(
            method, setup=setup, psolver=psolver, u=u, temp=temp, t=t
        )
    if isinstance(method, OneLegMethod):
        from .imex import create_stepper_oneleg

        return create_stepper_oneleg(
            method, setup=setup, psolver=psolver, u=u, temp=temp, t=t
        )
    return StepperState(
        u=u,
        temp=temp,
        t=jnp.asarray(t, setup.dtype),
        n=jnp.asarray(n, jnp.int32),
    )


def timestep(method, state, dt, *, setup, psolver, theta=None):
    """Advance one time step (pure). Dispatch on method type."""
    if isinstance(method, ExplicitRungeKuttaMethod):
        return _timestep_erk(method, state, dt, setup=setup, psolver=psolver, theta=theta)
    if isinstance(method, LMWray3):
        return _timestep_lmwray3(method, state, dt, setup=setup, psolver=psolver, theta=theta)
    if isinstance(method, AdamsBashforthCrankNicolsonMethod):
        from .imex import timestep_abcn

        return timestep_abcn(
            method, state, dt, setup=setup, psolver=psolver, theta=theta
        )
    if isinstance(method, OneLegMethod):
        from .imex import timestep_oneleg

        return timestep_oneleg(
            method, state, dt, setup=setup, psolver=psolver, theta=theta
        )
    if isinstance(method, ImplicitRungeKuttaMethod):
        from .implicit_rk import timestep_irk

        return timestep_irk(
            method, state, dt, setup=setup, psolver=psolver, theta=theta,
            niter=method.maxiter,
        )
    raise NotImplementedError(f"timestep not implemented for {type(method)}")


def _temp_rhs(u, temp, setup):
    ktemp = convection_diffusion_temp(u, temp, setup)
    if setup.temperature.dodissipation:
        ktemp = ktemp + dissipation(u, setup)
    return ktemp


def _timestep_erk(method, state, dt, *, setup, psolver, theta):
    """Per-stage: BC -> momentum (+temp RHS, +closure) -> accumulate ->
    BC -> project (reference step_explicit_runge_kutta.jl:61-120)."""
    u, temp, t, n = state
    A, b, c = method.A, method.b, method.c
    nstage = method.nstage
    m = setup.closure_model
    tstart = t
    ustart = u
    tempstart = temp
    ku = []
    ktemp = []

    for i in range(nstage):
        u = apply_bc_u(u, t, setup)
        if temp is not None:
            temp = apply_bc_temp(temp, t, setup)
        F = momentum(u, temp, t, setup)
        if temp is not None:
            ktemp.append(_temp_rhs(u, temp, setup))
        if m is not None:
            F = F + m(u, theta)
        ku.append(F)

        t = tstart + c[i] * dt

        u = ustart
        for j in range(i + 1):
            u = u + dt * A[i][j] * ku[j]
        if temp is not None:
            temp = tempstart
            for j in range(i + 1):
                temp = temp + dt * A[i][j] * ktemp[j]

        u = apply_bc_u(u, t, setup)
        u = project(u, setup, psolver=psolver)

    # Redundant, but Neumann BC need *exact* ghost copies (thin-volume
    # eps-guard in the diffusion term), cf. reference :113-117
    u = apply_bc_u(u, t, setup)
    if temp is not None:
        temp = apply_bc_temp(temp, t, setup)
    return StepperState(u=u, temp=temp, t=t, n=n + 1)


def _timestep_lmwray3(method, state, dt, *, setup, psolver, theta):
    """Low-storage Wray-3 (reference step_lmwray3.jl:109-194)."""
    u, temp, t, n = state
    m = setup.closure_model
    a, b, c = method.a, method.b, method.c
    nstage = len(a)
    tstart = t

    def f(u, temp, t):
        u = apply_bc_u(u, t, setup)
        if temp is not None:
            temp = apply_bc_temp(temp, t, setup)
        du = momentum(u, temp, t, setup)
        if m is not None:
            du = du + m(u, theta)
        dtemp = _temp_rhs(u, temp, setup) if temp is not None else None
        return du, dtemp

    ustart, tempstart = u, temp
    for i in range(nstage):
        ti = tstart + c[i] * dt
        du, dtemp = f(u, temp, ti)
        u = ustart + dt * a[i] * du
        if temp is not None:
            temp = tempstart + dt * a[i] * dtemp
        u = apply_bc_u(u, ti, setup)
        u = project(u, setup, psolver=psolver)
        if i < nstage - 1:
            ustart = ustart + dt * b[i] * du
            if temp is not None:
                tempstart = tempstart + dt * b[i] * dtemp

    t = tstart + dt
    u = apply_bc_u(u, t, setup)
    if temp is not None:
        temp = apply_bc_temp(temp, t, setup)
    return StepperState(u=u, temp=temp, t=t, n=n + 1)
