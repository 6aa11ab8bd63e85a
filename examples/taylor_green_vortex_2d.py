"""Taylor-Green vortex (2D): convergence study vs the analytic solution.

Port of the reference case examples/TaylorGreenVortex2D.jl:26-96
(expected O(n^-2) L2 convergence).
"""

import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.ops._stencil import slc


def solution(Re):
    def ufunc(dim, x, y, t=0.0):
        decay = jnp.exp(-2 * t / Re)
        return (
            -(dim == 0) * jnp.sin(x) * jnp.cos(y)
            + (dim == 1) * jnp.cos(x) * jnp.sin(y)
        ) * decay

    return ufunc

def compute_convergence(nlist, Re=2e3, tend=1.0, dt=1e-2, dtype=jnp.float64):
    uf = solution(Re)
    errs = []
    for n in nlist:
        x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
        bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
        setup = ins.Setup(x=x, boundary_conditions=bc, Re=Re, dtype=dtype)
        u0 = ins.velocityfield(setup, lambda d, x, y: uf(d, x, y, 0.0), doproject=False)
        state, _ = ins.solve_unsteady(setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt)
        uref = ins.velocityfield(
            setup, lambda d, x, y: uf(d, x, y, tend), doproject=False
        )
        g = setup.grid
        e2 = r2 = 0.0
        for a in range(2):
            sl = (a,) + slc(g.Iu[a])
            e2 += float(jnp.sum((state.u[sl] - uref[sl]) ** 2))
            r2 += float(jnp.sum(uref[sl] ** 2))
        errs.append(np.sqrt(e2 / r2))
    return errs


def run(quick=False, outdir=None):
    nlist = (16, 32) if quick else (16, 32, 64, 128)
    errs = compute_convergence(nlist, tend=0.1 if quick else 1.0)
    rates = [float(np.log2(errs[i] / errs[i + 1])) for i in range(len(errs) - 1)]
    return dict(n=nlist, errors=errs, rates=rates)


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
