"""Hardware check for the halo path's per-shard Pallas kernels.

Runs N steps of DecayingTurbulence3D on a 1-device TPU mesh through
`make_halo_fast_step` (which on TPU x-slab meshes dispatches the
halo-padded slab kernels) and compares the trajectory with the
single-chip fast path.  Also times both.

Run: python benchmarks/halo_tpu_check.py [n] [nsteps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import ins_tpu as ins
from ins_tpu.ops import fastpath
from ins_tpu.parallel.halo import make_halo_fast_step, shard_interior
from ins_tpu.time_steppers.step import StepperState


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dtype = jnp.float32
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype)
    method = ins.RKMethods.RK44()
    dt = jnp.asarray(1e-3 * 128 / n, dtype)

    u0 = jax.jit(lambda k: ins.random_field(setup, kp=10, rng=k))(
        jax.random.PRNGKey(1)
    )
    u0i = fastpath.strip_ghosts(u0)

    # Reference: single-chip fast path
    fast = fastpath.make_fast_timestep(setup, method)
    s = StepperState(u=u0i, temp=None, t=jnp.asarray(0.0, dtype),
                     n=jnp.asarray(0))
    fast_j = jax.jit(lambda st: fast(st, dt, None))
    for _ in range(nsteps):
        s = fast_j(s)
    jax.block_until_ready(s.u)
    u_ref = s.u

    # Halo path on a 1-device mesh (ppermute self-ring; per-shard Pallas)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    hstep = make_halo_fast_step(setup, method, mesh)
    hs = StepperState(
        u=shard_interior(mesh, u0i), temp=None,
        t=jnp.asarray(0.0, dtype), n=jnp.asarray(0),
    )
    for _ in range(nsteps):
        hs = hstep(hs, dt)
    jax.block_until_ready(hs.u)

    scale = float(jnp.max(jnp.abs(u_ref)))
    diff = float(jnp.max(jnp.abs(hs.u - u_ref)))
    print(f"halo-vs-fast n={n} steps={nsteps}: max diff {diff:.3e} "
          f"(scale {scale:.2f}, rel {diff / scale:.3e})")
    assert diff < 5e-3 * scale, "halo pallas path diverged"

    # timing (per step, scan-free jitted loop)
    t0 = time.perf_counter()
    for _ in range(20):
        hs = hstep(hs, dt)
    jax.block_until_ready(hs.u)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"halo path: {ms:.3f} ms/step at {n}^3 (1 shard)")

    # LES (fused Smagorinsky force stream through the halo stage chain)
    setup_les = ins.Setup(
        x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype,
        closure_model=ins.smagorinsky_closure_natural(setup),
    )
    lstep = make_halo_fast_step(setup_les, method, mesh)
    ls = StepperState(
        u=shard_interior(mesh, u0i), temp=None,
        t=jnp.asarray(0.0, dtype), n=jnp.asarray(0),
    )
    th = jnp.asarray(0.17, dtype)
    ls = lstep(ls, dt, th)
    jax.block_until_ready(ls.u)
    fast_les = fastpath.make_fast_timestep(setup_les, method)
    sl = StepperState(u=u0i, temp=None, t=jnp.asarray(0.0, dtype),
                      n=jnp.asarray(0))
    sl = jax.jit(lambda st: fast_les(st, dt, th))(sl)
    jax.block_until_ready(sl.u)
    dles = float(jnp.max(jnp.abs(ls.u - sl.u)))
    print(f"halo LES vs fast LES: max diff {dles:.3e}")
    assert dles < 5e-3 * scale
    t0 = time.perf_counter()
    for _ in range(20):
        ls = lstep(ls, dt, th)
    jax.block_until_ready(ls.u)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"halo LES path: {ms:.3f} ms/step at {n}^3 (1 shard)")


if __name__ == "__main__":
    main()
