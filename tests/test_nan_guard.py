"""SURVEY §5.3/§5.4: in-loop failure detection wired to checkpointing —
a deliberately unstable run aborts with the last finite state, writes an
emergency checkpoint, and can resume from it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.utils.checkpoint import checkpointer, load_checkpoint


def _setup(n=32):
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, Re=100.0,
                     dtype=jnp.float64)


def _u0(setup):
    return ins.random_field(setup, kp=4, rng=jax.random.PRNGKey(0))


def test_cfl_blowup_aborts_finite(tmp_path):
    setup = _setup()
    u0 = _u0(setup)
    # dt far beyond the CFL limit: RK44 blows up within a few steps
    with pytest.raises(ins.SolverDivergedError) as ei:
        ins.solve_unsteady(
            setup=setup, ustart=u0, tlims=(0.0, 10.0), dt=0.5,
            processors={"ckpt": checkpointer(str(tmp_path), nupdate=1)},
        )
    err = ei.value
    assert err.state is not None
    assert bool(jnp.all(jnp.isfinite(err.state["u"])))
    assert err.checkpoint is not None


def test_nan_injection_checkpoints_and_resumes(tmp_path):
    """A forcing that goes NaN at t > 0.03 poisons an otherwise-sane run:
    the guard must abort with the last healthy state, write the emergency
    checkpoint, and the run must resume from it (NaN-free setup)."""
    n = 32
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2

    def bad_force(dim, X, Y, t):
        return jnp.sqrt(0.03 - t) * jnp.ones_like(X)  # NaN for t > 0.03

    poisoned = ins.Setup(x=x, boundary_conditions=bc, Re=100.0,
                         bodyforce=bad_force, issteadybodyforce=False,
                         dtype=jnp.float64)
    clean = ins.Setup(x=x, boundary_conditions=bc, Re=100.0,
                      dtype=jnp.float64)
    u0 = ins.random_field(clean, kp=4, rng=jax.random.PRNGKey(0))

    with pytest.raises(ins.SolverDivergedError) as ei:
        ins.solve_unsteady(
            setup=poisoned, ustart=u0, tlims=(0.0, 0.1), dt=1e-3,
            processors={"ckpt": checkpointer(str(tmp_path), nupdate=1)},
        )
    err = ei.value
    assert err.checkpoint is not None
    assert bool(jnp.all(jnp.isfinite(err.state["u"])))
    assert float(jnp.max(jnp.abs(err.state["u"]))) < 10.0  # sane state

    ck = load_checkpoint(
        err.checkpoint,
        dict(u=err.state["u"], temp=None, t=err.state["t"],
             n=err.state["n"]),
    )
    t0 = float(ck["t"])
    assert 0.0 < t0 <= 0.035
    state, _ = ins.solve_unsteady(
        setup=clean, ustart=ck["u"], tlims=(t0, t0 + 0.02), dt=1e-3
    )
    assert bool(jnp.all(jnp.isfinite(state.u)))


def test_nan_guard_off_returns_nan():
    setup = _setup()
    u0 = _u0(setup)
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 5.0), dt=0.5, nan_guard=False
    )
    assert not bool(jnp.all(jnp.isfinite(state.u)))


def test_stable_run_unaffected():
    setup = _setup()
    u0 = _u0(setup)
    s1, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.02), dt=1e-3
    )
    s2, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.02), dt=1e-3, nan_guard=False
    )
    assert float(jnp.max(jnp.abs(s1.u - s2.u))) == 0.0


def test_adaptive_guard():
    setup = _setup()
    u0 = _u0(setup)
    # adaptive stepping with a huge CFL multiplier diverges; the guard
    # must catch it (either via non-finite dt or field check)
    with pytest.raises(ins.SolverDivergedError):
        ins.solve_unsteady(
            setup=setup, ustart=u0, tlims=(0.0, 50.0), cfl=50.0,
        )
