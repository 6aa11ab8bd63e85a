"""Double shear layer roll-up (2D periodic).

Port of reference examples/ShearLayer2D.jl.
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 32 if quick else 128
    tend = 0.1 if quick else 8.0
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=2e3, dtype=jnp.float32)
    d = np.pi / 15
    eps = 0.05

    def ufunc(dim, x, y):
        u1 = jnp.where(
            y <= np.pi, jnp.tanh((y - np.pi / 2) / d), jnp.tanh((3 * np.pi / 2 - y) / d)
        )
        return (dim == 0) * u1 + (dim == 1) * eps * jnp.sin(x)

    u0 = ins.velocityfield(setup, ufunc)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=0.01,
        processors={"log": ins.timelogger(nupdate=100)},
    )
    if outdir:
        from ins_tpu.plotting import fieldplot

        fieldplot(
            ins.get_state(state), setup=setup, fieldname="vorticity"
        ).savefig(f"{outdir}/vorticity.png")
    return dict(finite=bool(jnp.all(jnp.isfinite(state.u))))


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
