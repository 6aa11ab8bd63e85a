"""Taylor-Green vortex (3D): transition to turbulence in a periodic box.

Port of reference examples/TaylorGreenVortex3D.jl.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 16 if quick else 64
    tend = 0.02 if quick else 5.0
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32)

    def ufunc(d, x, y, z):
        return (
            (d == 0) * jnp.sin(x) * jnp.cos(y) * jnp.cos(z)
            - (d == 1) * jnp.cos(x) * jnp.sin(y) * jnp.cos(z)
        )

    u0 = ins.velocityfield(setup, ufunc)
    state, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-2 if not quick else 1e-3,
        processors={"log": ins.timelogger(nupdate=100)},
    )
    return dict(
        E=float(ins.total_kinetic_energy(state.u, setup)),
        finite=bool(jnp.all(jnp.isfinite(state.u))),
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
