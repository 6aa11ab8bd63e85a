"""Planar mixing layer (2D): unsteady tanh inflow, open domain.

Port of reference examples/PlanarMixing2D.jl.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 16 if quick else 64
    tend = 1.0 if quick else 100.0
    dU, Ubar = 1.0, 1.0
    eps1, eps2 = 0.082 * Ubar, 0.012 * Ubar
    n1, n2 = 0.4 * np.pi, 0.3 * np.pi
    w1, w2 = 0.22, 0.11

    def U(dim, x, y, t):
        pert = eps1 * (1 - jnp.tanh(y / 2) ** 2) * jnp.cos(n1 * y) * jnp.sin(
            w1 * t
        ) + eps2 * (1 - jnp.tanh(y / 2) ** 2) * jnp.cos(n2 * y) * jnp.sin(w2 * t)
        return jnp.where(dim == 0, 1.0 + dU / 2 * jnp.tanh(2 * y) + pert, 0.0)

    pbc = ins.PressureBC()
    bc = ((ins.DirichletBC(U), pbc), (pbc, pbc))
    x = (
        np.linspace(0.0, 256.0, 4 * n),
        np.linspace(-32.0, 32.0, n),
    )
    setup = ins.Setup(x=x, Re=500.0, boundary_conditions=bc, dtype=jnp.float32)
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda d, x, y: U(d, x, y, 0.0), psolver=psolver)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.1,
        method=ins.RKMethods.RK44P2(), psolver=psolver,
        processors={"log": ins.timelogger(nupdate=100)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
