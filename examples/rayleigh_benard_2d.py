"""Rayleigh-Bénard convection (2D), Ra = 1e7, with a Nusselt-number
processor. Port of reference examples/RayleighBenard2D.jl:74-90.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def nusselt_processor(setup, nupdate=20):
    """Nusselt numbers at the lower/upper plates (reference nusseltplot)."""
    g = setup.grid
    d1 = float(np.asarray(g.delta_u[1])[0])
    d2 = float(np.asarray(g.delta_u[1])[-2])
    dx = np.asarray(g.delta[0])

    def compute(state):
        temp = state["temp"]
        dTdy1 = (temp[:, 1] - temp[:, 0]) / d1
        nu1 = jnp.sum((-dTdy1 * dx)[1:-1])
        dTdy2 = (temp[:, -2] - temp[:, -3]) / d2
        nu2 = jnp.sum((-dTdy2 * dx)[1:-1])
        return float(state["t"]), float(nu1), float(nu2)

    return ins.observefield(compute, nupdate=nupdate)


def run(quick=False, outdir=None):
    n = 16 if quick else 100
    tend = 0.05 if quick else 20.0
    temperature = ins.temperature_equation(
        Pr=0.71,
        Ra=1e7,
        Ge=1.0,
        dodissipation=True,
        boundary_conditions=(
            (ins.SymmetricBC(), ins.SymmetricBC()),
            (ins.DirichletBC(1.0), ins.DirichletBC(0.0)),
        ),
        gdir=1,
        dtype=jnp.float32,
    )
    x = (
        ins.tanh_grid(0.0, 2.0, 2 * n, 1.2),
        ins.tanh_grid(0.0, 1.0, n, 1.2),
    )
    d = ins.DirichletBC()
    setup = ins.Setup(
        x=x, boundary_conditions=((d, d), (d, d)), temperature=temperature,
        dtype=jnp.float32,
    )
    psolver = ins.default_psolver(setup)
    u0 = ins.velocityfield(setup, lambda dim, x, y: 0.0 * x, psolver=psolver)
    key = jax.random.PRNGKey(0)
    temp0 = ins.temperaturefield(
        setup, lambda x, y: 1 - y + 0.001 * jnp.sin(20 * jnp.pi * x)
    )
    state, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tempstart=temp0, tlims=(0.0, tend),
        dt=5e-4 if quick else 2e-3, psolver=psolver,
        processors={
            "log": ins.timelogger(nupdate=1000),
            "nusselt": nusselt_processor(setup, nupdate=20),
            "nu_vol": ins.observe_nusselt(setup, nupdate=20),
        },
    )
    nus = out["nusselt"]
    return dict(
        finite=bool(jnp.all(jnp.isfinite(state.u)))
        and bool(jnp.all(jnp.isfinite(state.temp))),
        nusselt_last=nus[-1] if nus else None,
        nusselt_volume_last=out["nu_vol"]["Nu"][-1],
    )


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
