"""Explicit shard_map halo-exchange + pencil-FFT stepping vs the
single-device fast path (must match to roundoff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.fastpath import make_fast_timestep, strip_ghosts
from ins_tpu.parallel import make_mesh
from ins_tpu.parallel.halo import make_halo_fast_step, shard_interior
from ins_tpu.time_steppers.step import StepperState

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs8
@pytest.mark.parametrize("nshards", [2, 4, 8])
def test_halo_step_matches_fastpath(nshards):
    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float64)
    ps = ins.psolver_spectral(setup)
    method = ins.RKMethods.RK44()
    ug = ins.random_field(setup, kp=3, psolver=ps, rng=jax.random.PRNGKey(0))
    u0 = strip_ghosts(ug)

    # Reference: single-device roll-based fast path
    fast = make_fast_timestep(setup, method)
    s_ref = StepperState(
        u=u0, temp=None, t=jnp.asarray(0.0), n=jnp.asarray(0)
    )
    dt = 5e-3
    for _ in range(5):
        s_ref = fast(s_ref, jnp.asarray(dt), None)

    # Explicit halo/pencil path on an x-slab mesh
    mesh = make_mesh((nshards,), devices=jax.devices()[:nshards])
    step = make_halo_fast_step(setup, method, mesh)
    s_par = StepperState(
        u=shard_interior(mesh, u0),
        temp=None,
        t=jnp.asarray(0.0),
        n=jnp.asarray(0),
    )
    for _ in range(5):
        s_par = step(s_par, dt)

    diff = float(jnp.max(jnp.abs(s_par.u - s_ref.u)))
    assert diff < 1e-12, diff
