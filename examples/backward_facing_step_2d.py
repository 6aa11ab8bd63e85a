"""Backward-facing step (2D): channel inflow over a step, outflow BC.

Port of reference examples/BackwardFacingStep2D.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    if quick:
        nx, ny = 60, 10
        tend = 0.1
    else:
        nx, ny = 300, 50
        tend = 7.0

    def U(dim, x, y, t):
        return jnp.where((dim == 0) & (y >= 0), 24 * y * (0.5 - y), 0.0)

    bc = (
        (ins.DirichletBC(U), ins.PressureBC()),
        (ins.DirichletBC(), ins.DirichletBC()),
    )
    x = (
        np.linspace(0.0, 10.0, nx + 1),
        ins.cosine_grid(-0.5, 0.5, ny),
    )
    setup = ins.Setup(x=x, Re=3e3, boundary_conditions=bc, dtype=jnp.float32)
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(
        setup, lambda d, x, y: U(d, x, y, 0.0), psolver=psolver
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.002, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=500)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
