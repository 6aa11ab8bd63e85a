"""Decaying homogeneous turbulence (2D) with spectrum observer.

Port of reference examples/DecayingTurbulence2D.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 64 if quick else 256
    tend = 0.05 if quick else 1.0
    x = (np.linspace(0.0, 1.0, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float32)
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(lambda k: ins.random_field(setup, kp=20, psolver=psolver, rng=k))(
        jax.random.PRNGKey(0)
    )
    procs = {
        "log": ins.timelogger(nupdate=100),
        "spec": ins.observespectrum(setup, nupdate=max(1, int(tend / 1e-3 / 5))),
        "ehist": ins.observefield(
            lambda s: (float(s["t"]), float(ins.total_kinetic_energy(s["u"], setup))),
            nupdate=10,
        ),
    }
    state, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=1e-3,
        psolver=psolver, processors=procs,
    )
    if outdir:
        from ins_tpu.plotting import energy_spectrum_plot

        sp = out["spec"]
        energy_spectrum_plot(
            sp["kappa"], sp["ehat"][-1], slope=-3.0, path=f"{outdir}/spectrum.png"
        )
    e = [v[1] for v in out["ehist"]]
    return dict(E0=e[0], E1=e[-1], decaying=e[-1] < e[0])


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
