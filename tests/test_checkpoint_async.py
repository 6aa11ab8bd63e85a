"""Orbax async checkpointing (SURVEY §5.4, pod-scale variant): the
processor writes without blocking the solve, retention is enforced, and
the latest step round-trips bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.utils.checkpoint import async_checkpointer, load_async_checkpoint


def _setup(n=24):
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, Re=100.0, dtype=jnp.float64)


def test_async_checkpoint_roundtrip(tmp_path):
    setup = _setup()
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(0))
    ckdir = str(tmp_path / "orbax")
    state, _ = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.02),
        dt=1e-3,
        processors={"ck": async_checkpointer(ckdir, nupdate=5, keep_last=2)},
    )
    ck = load_async_checkpoint(ckdir)
    assert int(ck["n"]) == int(state.n)
    np.testing.assert_array_equal(np.asarray(ck["u"]), np.asarray(state.u))
    # retention: at most keep_last step dirs remain
    import os

    steps = [d for d in os.listdir(ckdir) if d.isdigit()]
    assert 1 <= len(steps) <= 2

    # structured restore against a `like` tree
    like = dict(u=np.zeros_like(np.asarray(state.u)), t=0.0, n=0)
    ck2 = load_async_checkpoint(ckdir, like=like)
    np.testing.assert_allclose(np.asarray(ck2["u"]), np.asarray(state.u))


def test_async_checkpoint_resume(tmp_path):
    setup = _setup()
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(1))
    ckdir = str(tmp_path / "orbax")
    ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.01),
        dt=1e-3,
        processors={"ck": async_checkpointer(ckdir, nupdate=10)},
    )
    ck = load_async_checkpoint(ckdir)
    t0 = float(ck["t"])
    state, _ = ins.solve_unsteady(
        setup=setup, ustart=jnp.asarray(ck["u"]), tlims=(t0, t0 + 0.01),
        dt=1e-3,
    )
    assert bool(jnp.all(jnp.isfinite(state.u)))
