"""Hardware probe for the fused Boussinesq temperature chain
(VERDICT-r3 item 5): parity of the fused/merged/hat temperature step
against the roll-graph twin ON TPU, then 3D RB step timings at size.

Usage: python benchmarks/temp_probe.py [n_parity] [n_bench]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import ins_tpu as ins  # noqa: E402
from ins_tpu.ops import fastpath as fp  # noqa: E402
from ins_tpu.time_steppers.step import StepperState  # noqa: E402


def make_setup(n, with_temp=True, dtype=jnp.float32):
    x = tuple(np.linspace(0.0, 1.0, n + 1) for _ in range(3))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    kw = {}
    if with_temp:
        kw["temperature"] = ins.temperature_equation(
            Pr=0.71, Ra=1e7, Ge=1.0, dodissipation=True,
            boundary_conditions=bc, gdir=2, dtype=dtype,
        )
    return ins.Setup(
        x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype, **kw
    )


def initial_state(setup, n):
    u0 = jax.jit(
        lambda key: ins.random_field(setup, kp=5, rng=key)
    )(jax.random.PRNGKey(1))
    u0 = fp.strip_ghosts(u0)
    xs = np.linspace(0.0, 1.0, n, endpoint=False)
    t0 = jnp.asarray(
        0.5
        + 0.1 * np.sin(2 * np.pi * xs)[:, None, None]
        * np.ones((n, n, n)),
        setup.dtype,
    )
    return StepperState(
        u=u0, temp=t0, t=jnp.asarray(0.0, setup.dtype), n=0
    )


def parity(n=128):
    setup = make_setup(n)
    m = ins.RKMethods.RK44()
    s0 = initial_state(setup, n)
    dt = 2e-4 * 128 / n

    step_fused = fp.make_fast_timestep(setup, m)
    hat = fp.make_fast_timestep_hat(setup, m)

    # roll twin: gate every fused path off
    step_roll = fp.make_fast_timestep(setup, m, _force_roll=True)

    @jax.jit
    def run_fused(s):
        for _ in range(5):
            s = step_fused(s, dt, None)
        return s

    @jax.jit
    def run_roll(s):
        for _ in range(5):
            s = step_roll(s, dt, None)
        return s

    @jax.jit
    def run_hat(s):
        to_hat, step_hat, from_hat = hat
        h = to_hat(s)
        for _ in range(5):
            h = step_hat(h, dt, None)
        return from_hat(h)

    a, b = run_fused(s0), run_roll(s0)
    su, sT = float(jnp.max(jnp.abs(b.u))), float(jnp.max(jnp.abs(b.temp)))
    du = float(jnp.max(jnp.abs(a.u - b.u))) / su
    dT = float(jnp.max(jnp.abs(a.temp - b.temp))) / sT
    print(f"parity fused-vs-roll n={n}: rel du={du:.3e} dT={dT:.3e}")
    if hat is not None:
        c = run_hat(s0)
        du_h = float(jnp.max(jnp.abs(c.u - b.u))) / su
        dT_h = float(jnp.max(jnp.abs(c.temp - b.temp))) / sT
        print(f"parity hat-vs-roll   n={n}: rel du={du_h:.3e} dT={dT_h:.3e}")
        assert du_h < 5e-5 and dT_h < 5e-5, "hat temp parity FAIL"
    assert du < 5e-5 and dT < 5e-5, "fused temp parity FAIL"


def bench(n=256, nstep=10, with_temp=True):
    setup = make_setup(n, with_temp=with_temp)
    m = ins.RKMethods.RK44()
    s0 = initial_state(setup, n)
    if not with_temp:
        s0 = s0._replace(temp=None)
    dt = jnp.asarray(2e-4 * 128 / n, setup.dtype)
    hat = fp.make_fast_timestep_hat(setup, m)
    step = fp.make_fast_timestep(setup, m)

    @partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
    def scan_steps(s, k):
        if hat is not None:
            to_hat, step_hat, from_hat = hat
            h = to_hat(s)
            h, _ = jax.lax.scan(
                lambda hi, _: (step_hat(hi, dt, None), None), h, None,
                length=k,
            )
            return from_hat(h)
        s, _ = jax.lax.scan(
            lambda si, _: (step(si, dt, None), None), s, None, length=k
        )
        return s

    s = scan_steps(s0, nstep)
    jax.block_until_ready(s.u)
    el = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = scan_steps(s, nstep)
        jax.block_until_ready(s.u)
        el = min(el, time.perf_counter() - t0)
    assert bool(jnp.all(jnp.isfinite(s.u)))
    if with_temp:
        assert bool(jnp.all(jnp.isfinite(s.temp)))
    tag = "RB (temp)" if with_temp else "no-temp  "
    print(
        f"{tag} n={n} merged={hat is not None}: "
        f"{el / nstep * 1e3:.2f} ms/step "
        f"({n**3 * nstep / el:.3e} CUPS)"
    )
    return el / nstep * 1e3


if __name__ == "__main__":
    n_par = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    parity(n_par)
    ms_t = bench(n_b, with_temp=True)
    ms_0 = bench(n_b, with_temp=False)
    print(f"temp overhead at {n_b}^3: {ms_t / ms_0:.3f}x (target <=1.35x)")
