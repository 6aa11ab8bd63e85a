"""Lid-driven cavity (2D): Dirichlet box with moving top lid, cosine grid.

Port of reference examples/LidDrivenCavity2D.jl:49-69.
"""

import jax.numpy as jnp

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 16 if quick else 32
    tend = 0.1 if quick else 10.0
    x = (ins.cosine_grid(0.0, 1.0, n), ins.cosine_grid(0.0, 1.0, n))
    lid = (1.0, 0.0)
    bc = (
        (ins.DirichletBC(), ins.DirichletBC()),
        (ins.DirichletBC(), ins.DirichletBC(lid)),
    )
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32)
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda d, x, y: 0.0 * x, psolver=psolver)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-3, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=1000)},
    )
    return dict(
        umax=float(jnp.max(jnp.abs(state.u))),
        finite=bool(jnp.all(jnp.isfinite(state.u))),
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
