"""Rayleigh-Bénard convection (3D), spanwise periodic.

Port of reference examples/RayleighBenard3D.jl.
"""

import jax.numpy as jnp

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 8 if quick else 60
    tend = 0.02 if quick else 10.0
    temperature = ins.temperature_equation(
        Pr=0.71,
        Ra=1e7,
        Ge=1.0,
        dodissipation=True,
        boundary_conditions=(
            (ins.PeriodicBC(), ins.PeriodicBC()),
            (ins.SymmetricBC(), ins.SymmetricBC()),
            (ins.DirichletBC(1.0), ins.DirichletBC(0.0)),
        ),
        gdir=2,
        dtype=jnp.float32,
    )
    x = (
        ins.stretched_grid(0.0, 2.0, 2 * n),
        ins.stretched_grid(0.0, 1.0, n),
        ins.tanh_grid(0.0, 1.0, n, 1.2),
    )
    d = ins.DirichletBC()
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()), (d, d), (d, d))
    setup = ins.Setup(
        x=x, boundary_conditions=bc, temperature=temperature, dtype=jnp.float32
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda dim, x, y, z: 0.0 * x, psolver=psolver)
    temp0 = ins.temperaturefield(
        setup, lambda x, y, z: 1 - z + 0.001 * jnp.sin(10 * jnp.pi * x)
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tempstart=temp0, tlims=(0.0, tend),
        dt=1e-3, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=200)},
    )
    return dict(
        finite=bool(jnp.all(jnp.isfinite(state.u)))
        and bool(jnp.all(jnp.isfinite(state.temp)))
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
