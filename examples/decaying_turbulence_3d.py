"""Decaying homogeneous turbulence (3D, 128^3) — the reference's de-facto
performance configuration (examples/DecayingTurbulence3D.jl:15-38).
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None, n=None, smagorinsky=None):
    n = n or (16 if quick else 128)
    tend = 0.01 if quick else 2.0
    dt = 1e-3
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    closure = None
    base = ins.Setup(x=x, boundary_conditions=bc, Re=4e3, dtype=jnp.float32)
    if smagorinsky is not None:
        closure = ins.smagorinsky_closure_natural(base)
    setup = ins.Setup(
        x=x, boundary_conditions=bc, Re=4e3, closure_model=closure,
        dtype=jnp.float32,
    )
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda k: ins.random_field(setup, kp=5 if quick else 10,
                                            psolver=psolver, rng=k))(
        jax.random.PRNGKey(0)
    )
    procs = {
        "log": ins.timelogger(nupdate=100),
        "ehist": ins.observefield(
            lambda s: (float(s["t"]), float(ins.total_kinetic_energy(s["u"], setup))),
            nupdate=max(1, int(round(tend / dt)) // 10),
        ),
    }
    theta = None if smagorinsky is None else jnp.asarray(smagorinsky, jnp.float32)
    state, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt,
        psolver=psolver, processors=procs, theta=theta,
    )
    e = [v[1] for v in out["ehist"]]
    return dict(n=n, E0=e[0], E1=e[-1], decaying=e[-1] < e[0])


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
