"""Multiple actuator disks in 2D.

Port of reference examples/MultiActuator.jl (three staggered disks).
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 10 if quick else 40
    tend = 0.5 if quick else 12.0
    x = (
        np.linspace(0.0, 10.0, 5 * n + 1),
        np.linspace(-2.0, 2.0, 2 * n + 1),
    )

    def inflow(dim, x, y, t):
        return jnp.sin(np.pi * (jnp.sin(np.pi * t / 6) / 6 + (dim == 0) / 2))

    bc = (
        (ins.DirichletBC(inflow), ins.PressureBC()),
        (ins.PressureBC(), ins.PressureBC()),
    )
    disks = [(2.0, 0.0), (4.0, 0.7), (6.4, -1.0)]
    D, delta, Ct = 1.0, 0.11, 0.2
    c = Ct / (D * delta)

    def bodyforce(dim, x, y, t):
        f = 0.0
        for (xc, yc) in disks:
            inside = (jnp.abs(x - xc) <= delta / 2) & (jnp.abs(y - yc) <= D / 2)
            f = f - c * (dim == 0) * inside
        return f

    setup = ins.Setup(
        x=x, Re=100.0, boundary_conditions=bc, bodyforce=bodyforce,
        issteadybodyforce=True, dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(
        setup, lambda d, x, y: inflow(d, x, y, 0.0), psolver=psolver
    )
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.05,
        method=ins.RKMethods.RK44P2(), psolver=psolver,
        processors={"log": ins.timelogger(nupdate=24)},
    )
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
