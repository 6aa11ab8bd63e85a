"""Actuator disk in 2D: unsteady Dirichlet inflow, pressure outflow, steady
body-force disk. Port of reference examples/Actuator2D.jl:26-40.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def inflow(dim, x, y, t):
    return jnp.sin(np.pi * (jnp.sin(np.pi * t / 6) / 6 + (dim == 0) / 2))


def run(quick=False, outdir=None):
    n = 10 if quick else 40
    tend = 0.5 if quick else 12.0
    x = (
        np.linspace(0.0, 10.0, 5 * n + 1),
        np.linspace(-2.0, 2.0, 2 * n + 1),
    )
    bc = (
        (ins.DirichletBC(inflow), ins.PressureBC()),
        (ins.PressureBC(), ins.PressureBC()),
    )
    xc, yc, D, delta, Ct = 2.0, 0.0, 1.0, 0.11, 0.2
    c = Ct / (D * delta)

    def bodyforce(dim, x, y, t):
        inside = (jnp.abs(x - xc) <= delta / 2) & (jnp.abs(y - yc) <= D / 2)
        return -c * (dim == 0) * inside

    setup = ins.Setup(
        x=x, Re=100.0, boundary_conditions=bc, bodyforce=bodyforce,
        issteadybodyforce=True, dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(
        setup, lambda d, x, y: inflow(d, x, y, 0.0), psolver=psolver
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.05,
        method=ins.RKMethods.RK44P2(), psolver=psolver,
        processors={"log": ins.timelogger(nupdate=24)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
