"""Rayleigh-Taylor instability (2D): heavy fluid over light fluid.

Port of reference examples/RayleighTaylor2D.jl.
"""

import jax.numpy as jnp

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 12 if quick else 50
    tend = 0.05 if quick else 10.0
    x = (
        ins.tanh_grid(0.0, 1.0, n, 1.5),
        ins.tanh_grid(0.0, 2.0, 2 * n, 1.5),
    )
    temperature = ins.temperature_equation(
        Pr=0.71,
        Ra=1e6,
        Ge=1.0,
        dodissipation=True,
        boundary_conditions=(
            (ins.SymmetricBC(), ins.SymmetricBC()),
            (ins.SymmetricBC(), ins.SymmetricBC()),
        ),
        gdir=1,
        nondim_type=1,
        dtype=jnp.float32,
    )
    d = ins.DirichletBC()
    setup = ins.Setup(
        x=x, boundary_conditions=((d, d), (d, d)), temperature=temperature,
        dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda dim, x, y: 0.0 * x, psolver=psolver)
    temp0 = ins.temperaturefield(
        setup,
        lambda x, y: jnp.where(1 + jnp.sin(jnp.pi * x) / 50 > y, 1.0, 0.0),
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tempstart=temp0, tlims=(0.0, tend),
        dt=5e-3 if not quick else 1e-3, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=500)},
    )
    return dict(
        finite=bool(jnp.all(jnp.isfinite(state.u)))
        and bool(jnp.all(jnp.isfinite(state.temp)))
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
