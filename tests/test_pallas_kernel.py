"""Pallas fused convection-diffusion kernel: correctness in interpreter
mode (TPU execution exercised by bench/verify on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.pallas_kernels import convdiff_periodic_uniform_3d


def test_convdiff_kernel_matches_slice_graph():
    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32)
    u = ins.random_field(setup, kp=4, rng=jax.random.PRNGKey(0))
    F_ref = ins.convectiondiffusion(u, setup)
    dx = [float(np.asarray(setup.grid.delta[d])[0]) for d in range(3)]
    F_pl = convdiff_periodic_uniform_3d(u, 1e-3, dx, interpret=True)
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F_ref - F_pl))) < 1e-5 * max(scale, 1.0)
