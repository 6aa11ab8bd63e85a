"""Hardware parity check for the fused fast path.

Runs N steps of DecayingTurbulence3D at a given size twice:
(a) the production fast path (fused Pallas stage kernels + Pallas/XLA
    Poisson, whatever `make_fast_timestep` dispatches to), and
(b) the pure roll-graph path with the XLA 6-contraction Poisson
    (use_pallas force-disabled),
and reports the max relative trajectory difference plus the post-step
divergence norm of (a).  Expected: f32-rounding-level agreement (~1e-5
relative over 5 steps) and divergence at the pressure-solve residual
level.

Run: python benchmarks/parity_check.py [n] [nsteps]
"""

import os
import sys
from unittest import mock

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.ops import fastpath
from ins_tpu.time_steppers.step import StepperState


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dtype = jnp.float32
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype)
    psolver = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    dt = jnp.asarray(1e-3 * 128 / n, dtype)

    u0 = jax.jit(lambda k: ins.random_field(setup, kp=10, rng=k))(
        jax.random.PRNGKey(1)
    )
    u0i = fastpath.strip_ghosts(u0)

    def run(step):
        s = StepperState(
            u=u0i, temp=None, t=jnp.asarray(0.0, dtype), n=jnp.asarray(0)
        )
        stepj = jax.jit(lambda st: step(st, dt, None))
        for _ in range(nsteps):
            s = stepj(s)
        jax.block_until_ready(s.u)
        return s.u

    u_fast = run(fastpath.make_fast_timestep(setup, method))
    with mock.patch(
        "ins_tpu.ops.pallas_kernels.pallas_supported", lambda s: False
    ), mock.patch(
        "ins_tpu.ops.poisson_pallas.poisson_pallas_supported",
        lambda Np: False,
    ):
        u_ref = run(fastpath.make_fast_timestep(setup, method))

    scale = float(jnp.max(jnp.abs(u_ref)))
    diff = float(jnp.max(jnp.abs(u_fast - u_ref)))
    dxs = tuple(float(np.asarray(setup.grid.delta[d])[0]) for d in range(3))
    div = sum(
        (u_fast[a] - jnp.roll(u_fast[a], 1, a)) / dxs[a] for a in range(3)
    )
    divnorm = float(jnp.max(jnp.abs(div)))
    print(
        f"n={n} steps={nsteps}: max|fast-ref|={diff:.3e} (scale {scale:.3f},"
        f" rel {diff / scale:.3e}); max|div u_fast|={divnorm:.3e}"
    )
    assert diff < 5e-4 * scale, "fused path diverged from reference path"


if __name__ == "__main__":
    main()
