"""Kolmogorov flow: sinusoidal body force in a periodic box.

Port of reference examples/Kolmogorov2D.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 32 if quick else 256
    tend = 0.05 if quick else 2.0
    x = (np.linspace(0.0, 1.0, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(
        x=x,
        boundary_conditions=bc,
        Re=2e3,
        bodyforce=lambda d, x, y, t: (d == 0) * 5 * jnp.sin(8 * jnp.pi * y),
        issteadybodyforce=True,
        dtype=jnp.float32,
    )
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda k: ins.random_field(setup, A=1e-2, kp=4, psolver=psolver, rng=k))(
        jax.random.PRNGKey(0)
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-3,
        psolver=psolver, processors={"log": ins.timelogger(nupdate=100)},
    )
    return dict(
        umax=float(jnp.max(jnp.abs(state.u))),
        finite=bool(jnp.all(jnp.isfinite(state.u))),
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
