"""Lid-driven cavity (3D). Port of reference examples/LidDrivenCavity3D.jl."""

import jax.numpy as jnp

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 8 if quick else 32
    tend = 0.05 if quick else 0.2
    x = (
        ins.cosine_grid(0.0, 1.0, n),
        ins.cosine_grid(0.0, 1.0, n),
        ins.cosine_grid(-0.2, 0.2, max(2, n // 2)),
    )
    lid = (1.0, 0.0, 0.2)
    d = ins.DirichletBC()
    bc = ((d, d), (d, ins.DirichletBC(lid)), (ins.PeriodicBC(), ins.PeriodicBC()))
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32)
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda d_, x, y, z: 0.0 * x, psolver=psolver)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-3, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=100)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
