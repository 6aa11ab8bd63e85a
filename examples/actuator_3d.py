"""Actuator disk in 3D with swiveling inflow.

Port of reference examples/Actuator3D.jl.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    if quick:
        nx, ny = 10, 8
        tend = 0.2
    else:
        nx, ny = 30, 40
        tend = 3.0
    x = (
        np.linspace(0.0, 6.0, nx + 1),
        np.linspace(-2.0, 2.0, ny + 1),
        np.linspace(-2.0, 2.0, ny + 1),
    )

    def inflow(dim, x, y, z, t):
        return (
            (dim == 0) * jnp.cos(np.pi / 6 * jnp.sin(np.pi / 6 * t))
            + (dim == 1) * jnp.sin(np.pi / 6 * jnp.sin(np.pi / 6 * t))
            + (dim == 2) * 0.0
        )

    pbc = ins.PressureBC()
    bc = ((ins.DirichletBC(inflow), pbc), (pbc, pbc), (pbc, pbc))
    cx, cy, cz, D, delta, Ct = 2.0, 0.0, 0.0, 1.0, 0.11, 0.2
    c = Ct / (np.pi * (D / 2) ** 2 * delta)

    def bodyforce(dim, x, y, z, t):
        inside = (jnp.abs(x - cx) <= delta / 2) & (
            (y - cy) ** 2 + (z - cz) ** 2 <= (D / 2) ** 2
        )
        return -c * (dim == 0) * inside

    setup = ins.Setup(
        x=x, Re=100.0, boundary_conditions=bc, bodyforce=bodyforce,
        issteadybodyforce=True, dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(
        setup, lambda d, x, y, z: jnp.where(d == 0, 1.0, 0.0) + 0.0 * x,
        psolver=psolver,
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.05,
        method=ins.RKMethods.RK44P2(), psolver=psolver,
        processors={"log": ins.timelogger(nupdate=20)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
