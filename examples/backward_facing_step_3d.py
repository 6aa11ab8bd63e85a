"""Backward-facing step (3D, spanwise-periodic).

Port of reference examples/BackwardFacingStep3D.jl.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    if quick:
        nx, ny, nz = 30, 8, 4
        tend = 0.05
    else:
        nx, ny, nz = 150, 25, 8
        tend = 2.0

    def U(dim, x, y, z, t):
        return jnp.where((dim == 0) & (y >= 0), 24 * y * (0.5 - y), 0.0)

    bc = (
        (ins.DirichletBC(U), ins.PressureBC()),
        (ins.DirichletBC(), ins.DirichletBC()),
        (ins.PeriodicBC(), ins.PeriodicBC()),
    )
    x = (
        np.linspace(0.0, 10.0, nx + 1),
        ins.cosine_grid(-0.5, 0.5, ny),
        np.linspace(-0.25, 0.25, nz + 1),
    )
    setup = ins.Setup(x=x, Re=3e3, boundary_conditions=bc, dtype=jnp.float32)
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(
        setup, lambda d, x, y, z: U(d, x, y, z, 0.0), psolver=psolver
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.002, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=200)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
