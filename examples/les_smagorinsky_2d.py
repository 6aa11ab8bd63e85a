"""LES of 2D decaying turbulence with the Smagorinsky closure
(natural form), compared against a no-model run.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins


def run(quick=False, outdir=None):
    n = 32 if quick else 128
    tend = 0.05 if quick else 1.0
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    base = ins.Setup(x=x, boundary_conditions=bc, Re=1e4, dtype=jnp.float32)
    les = ins.Setup(
        x=x, boundary_conditions=bc, Re=1e4,
        closure_model=ins.smagorinsky_closure_natural(base),
        dtype=jnp.float32,
    )
    psolver = ins.psolver_spectral(base)
    u0 = jax.jit(lambda k: ins.random_field(base, kp=10, psolver=psolver, rng=k))(
        jax.random.PRNGKey(0)
    )
    s0, _ = ins.solve_unsteady(
        setup=base, ustart=u0, tlims=(0.0, tend), dt=1e-3, psolver=psolver
    )
    s1, _ = ins.solve_unsteady(
        setup=les, ustart=u0, tlims=(0.0, tend), dt=1e-3, psolver=psolver,
        theta=jnp.asarray(0.17, jnp.float32),
    )
    e_dns = float(ins.total_kinetic_energy(s0.u, base))
    e_les = float(ins.total_kinetic_energy(s1.u, base))
    return dict(E_nomodel=e_dns, E_les=e_les, les_dissipates=e_les < e_dns)


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
