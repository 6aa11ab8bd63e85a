"""Plane jets (2D): merging tanh jet profiles in a periodic box.

Port of reference examples/PlaneJets2D.jl (profile U_C).
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


V = 21.619435700313733


def U_profile(y):
    return V / 2 * (
        jnp.tanh(((y + 1.0) + 0.5) / 0.1) - jnp.tanh(((y + 1.0) - 0.5) / 0.1)
    ) + V / 4 * (
        jnp.tanh(((y - 1.5) / 2 + 0.5) / 0.2)
        - jnp.tanh(((y - 1.5) / 2 - 0.5) / 0.2)
    )


def run(quick=False, outdir=None):
    n = 16 if quick else 64
    tend = 0.002 if quick else 0.1
    x = (
        np.linspace(0.0, 4 * np.pi, 2 * n + 1),
        np.linspace(-2 * np.pi, 2 * np.pi, 2 * n + 1),
    )
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=6e3, dtype=jnp.float32)

    def ufunc(dim, x, y):
        pert = 0.1 * V * jnp.sin(x) * jnp.exp(-(y**2))
        return (dim == 0) * U_profile(y) + (dim == 1) * pert

    u0 = ins.velocityfield(setup, ufunc)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-4,
        processors={"log": ins.timelogger(nupdate=100)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
