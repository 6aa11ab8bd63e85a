"""Turbulent channel flow (3D): streamwise/spanwise periodic, no-slip
walls, constant streamwise body force.

Port of reference examples/TurbulentChannel.jl / TCF.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 8 if quick else 50
    tend = 0.02 if quick else 10.0
    x = (
        np.linspace(0.0, 4 * np.pi, 2 * n + 1),
        np.linspace(0.0, 2 * np.pi, n + 1),
        ins.tanh_grid(0.0, 2.0, n, 1.2),
    )
    d = ins.DirichletBC()
    bc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (d, d),
    )
    setup = ins.Setup(
        x=x,
        boundary_conditions=bc,
        Re=1e3,
        bodyforce=lambda dim, x, y, z, t: jnp.where(dim == 0, 1.0, 0.0) + 0.0 * x,
        issteadybodyforce=True,
        dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)

    def ufunc(dim, x, y, z):
        base = jnp.where(dim == 0, 6.0 * z * (2.0 - z) / 2.0**2, 0.0)
        pert = 0.05 * jnp.sin(2 * x) * jnp.sin(2 * y) * jnp.sin(np.pi * z)
        return base + pert

    u0 = ins.velocityfield(setup, ufunc, psolver=psolver)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-3, psolver=psolver,
        processors={"log": ins.timelogger(nupdate=200)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
