"""Golden-trajectory regression test (SURVEY §4 "golden-comparison"
contract): a short 64^3 decaying-turbulence run must reproduce committed
kinetic-energy / enstrophy / spectrum traces, so kernel rewrites cannot
silently shift the physics.

Regenerate the golden after an *intentional* numerics change with:

    python tests/test_fidelity_golden.py --regen

and commit the diff of tests/golden/fidelity_64.json alongside the change
explaining why the physics moved.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fidelity_64.json")


def run_trajectory(n=64, nstep=16, dt=2e-3, Re=2000.0):
    """Deterministic CPU/f64 trajectory: fixed seed, fixed dt, spectral
    projection (the conftest forces the CPU backend + x64)."""
    from ins_tpu.ops._stencil import slc
    from ins_tpu.ops.operators import scalewithvolume, vorticity

    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=Re, dtype=jnp.float64)
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(
        lambda k: ins.random_field(setup, kp=5, psolver=psolver, rng=k)
    )(jax.random.PRNGKey(11))

    ip = slc(setup.grid.Ip)

    @jax.jit
    def enstrophy(u):
        w = vorticity(u, setup)
        w2 = jnp.sum(w * w, axis=0)
        return 0.5 * jnp.sum(scalewithvolume(w2, setup)[ip])

    procs = {
        "trace": ins.observefield(
            lambda s: (
                float(s["t"]),
                float(ins.total_kinetic_energy(s["u"], setup)),
                float(enstrophy(s["u"])),
            ),
            nupdate=4,
        ),
        "spec": ins.observespectrum(setup, nupdate=nstep),
    }
    state, out = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, nstep * dt),
        dt=dt,
        psolver=psolver,
        processors=procs,
    )
    trace = np.asarray(out["trace"])
    return {
        "t": trace[:, 0].tolist(),
        "E": trace[:, 1].tolist(),
        "Z": trace[:, 2].tolist(),
        "ehat_final": np.asarray(out["spec"]["ehat"][-1]).tolist(),
        "kappa": np.asarray(out["spec"]["kappa"]).tolist(),
    }


def test_golden_trajectory():
    with open(GOLDEN) as f:
        want = json.load(f)
    got = run_trajectory()
    # f64 CPU is deterministic; the tolerance absorbs benign
    # summation-order changes from kernel rewrites without letting a
    # physics shift (scheme/coefficient change) through.
    np.testing.assert_allclose(got["t"], want["t"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["E"], want["E"], rtol=1e-7)
    np.testing.assert_allclose(got["Z"], want["Z"], rtol=1e-6)
    ew, eg = np.asarray(want["ehat_final"]), np.asarray(got["ehat_final"])
    m = ew > 1e-30
    np.testing.assert_allclose(eg[m], ew[m], rtol=1e-5)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()
    # the golden is defined on the deterministic CPU/f64 backend
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if args.regen:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        data = run_trajectory()
        with open(GOLDEN, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {GOLDEN}")
