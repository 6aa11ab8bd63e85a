"""Hand-rolled multichip stepping: shard_map + explicit ICI collectives.

The GSPMD path (`solve_unsteady(mesh=...)`) lets XLA insert collectives.
This module is the explicitly-scheduled alternative for the periodic
uniform fast path, built the way a pod-scale run wants it
(SURVEY.md §2.5 "TPU-native mapping", items a-c):

- **1-D x-slab domain decomposition** of the ghost-free interior field;
- **halo exchange** of single x-planes with `lax.ppermute` ring shifts
  (replacing the reference's ghost reads at shard edges);
- **pencil-decomposed FFT** Poisson solve: local FFTs over the unsharded
  y/z axes, `lax.all_to_all` transpose to localize x, FFT, eigenvalue
  scale, and the inverse chain — the Ulysses-style axis swap around a
  sequential transform.

Everything runs inside one `shard_map`, so the collective schedule is
explicit and rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..time_steppers.methods import ExplicitRungeKuttaMethod
from ..time_steppers.step import StepperState

__all__ = ["make_halo_fast_step", "shard_interior"]

AXIS = "x"


def shard_interior(mesh, u_int):
    """Place a ghost-free interior field (D, nx, ny[, nz]) with its first
    spatial dim sharded over the mesh's 'x' axis."""
    spec = P(None, AXIS, *([None] * (u_int.ndim - 2)))
    return jax.device_put(u_int, NamedSharding(mesh, spec))


def _halo_pad_x(v, nshards):
    """Pad axis 0 of a per-device slab with one plane from each ring
    neighbor (periodic)."""
    right_perm = [(i, (i + 1) % nshards) for i in range(nshards)]
    left_perm = [(i, (i - 1) % nshards) for i in range(nshards)]
    # Halo received from the LEFT neighbor = its last plane
    from_left = jax.lax.ppermute(v[-1:], AXIS, right_perm)
    # Halo received from the RIGHT neighbor = its first plane
    from_right = jax.lax.ppermute(v[:1], AXIS, left_perm)
    return jnp.concatenate([from_left, v, from_right], axis=0)


def make_halo_fast_step(setup, method, mesh):
    """Build `(shard_state_fn, step_fn)` for a 3D uniform periodic setup:
    explicit-RK stepping on x-slab-sharded interior fields with ppermute
    halos and an all_to_all pencil FFT projection."""
    g = setup.grid
    D = g.dim
    assert D == 3, "halo fast path: 3D"
    assert all(g.periodic) and all(g.uniform)
    assert isinstance(method, ExplicitRungeKuttaMethod)
    nshards = mesh.shape[AXIS]
    n = tuple(g.Np)
    nx, ny, nz = n
    assert nx % nshards == 0 and ny % nshards == 0
    nx_loc = nx // nshards
    ny_loc = ny // nshards
    dxs = tuple(float(np.asarray(g.delta[d])[0]) for d in range(D))
    vol = float(np.prod(dxs))

    # Spectral eigenvalues on the (x, y, z_half) grid, sharded chunkable
    nzh = nz // 2 + 1
    denom = np.zeros((nx, ny, nzh))
    for d, kd in enumerate((nx, ny, nz)):
        kmax = nzh if d == 2 else kd
        k = np.arange(kmax)
        a = 4 * vol * np.sin(np.pi * k / kd) ** 2 / dxs[d] ** 2
        denom += a.reshape([-1 if i == d else 1 for i in range(3)])
    denom[0, 0, 0] = 1.0
    inv_denom_full = np.where(
        np.arange(nx)[:, None, None]
        + np.arange(ny)[None, :, None]
        + np.arange(nzh)[None, None, :]
        == 0,
        0.0,
        -1.0 / denom,
    )
    cdtype = jnp.complex64 if setup.dtype == jnp.float32 else jnp.complex128
    inv_denom_full = jnp.asarray(inv_denom_full, setup.dtype)

    A, c, ns = method.A, method.c, method.nstage

    def convdiff_local(u):
        """u: (3, nx_loc, ny, nz) slab. x-shifts via halo-padded slicing,
        y/z via local rolls (those axes are unsharded)."""
        visc = 1 / setup.Re
        up = jnp.stack([_halo_pad_x(u[a], nshards) for a in range(3)])

        def shift(a, sx, sy, sz):
            v = up[a, 1 + sx : 1 + sx + nx_loc]
            if sy:
                v = jnp.roll(v, -sy, axis=1)
            if sz:
                v = jnp.roll(v, -sz, axis=2)
            return v

        e = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
        F = []
        for a in range(3):
            u_c = shift(a, 0, 0, 0)
            f = jnp.zeros_like(u_c)
            for b in range(3):
                sb = e[b]
                u_pb = shift(a, *sb)
                u_mb = shift(a, *(-s for s in sb))
                f += (visc / dxs[b] ** 2) * (u_pb - 2.0 * u_c + u_mb)
                uab1 = 0.5 * (u_mb + u_c)
                uab2 = 0.5 * (u_c + u_pb)
                if a == b:
                    uba1, uba2 = uab1, uab2
                else:
                    sa = e[a]
                    ub_c = shift(b, 0, 0, 0)
                    ub_pa = shift(b, *sa)
                    ub_mb = shift(b, *(-s for s in sb))
                    ub_mb_pa = shift(b, *(xx - yy for xx, yy in zip(sa, sb)))
                    uba1 = 0.5 * (ub_mb + ub_mb_pa)
                    uba2 = 0.5 * (ub_c + ub_pa)
                f -= (uab2 * uba2 - uab1 * uba1) / dxs[b]
            F.append(f)
        return jnp.stack(F)

    def poisson_pencil(div):
        """div: (nx_loc, ny, nz) -> pressure, same layout. Pencil FFT:
        rfft z + fft y locally, all_to_all to localize x, fft x, scale,
        inverse chain."""
        idx = jax.lax.axis_index(AXIS)
        fh = jnp.fft.rfft(div, axis=2)  # (nx_loc, ny, nzh) complex
        fh = jnp.fft.fft(fh, axis=1)
        # Transpose: split y into shards, gather x -> (nx, ny_loc, nzh)
        fh = jax.lax.all_to_all(
            fh, AXIS, split_axis=1, concat_axis=0, tiled=True
        )
        fh = jnp.fft.fft(fh, axis=0)
        scale = jax.lax.dynamic_slice_in_dim(
            inv_denom_full, idx * ny_loc, ny_loc, 1
        )
        fh = fh * scale.astype(fh.dtype)
        fh = jnp.fft.ifft(fh, axis=0)
        # Transpose back: split x, gather y -> (nx_loc, ny, nzh)
        fh = jax.lax.all_to_all(
            fh, AXIS, split_axis=0, concat_axis=1, tiled=True
        )
        fh = jnp.fft.ifft(fh, axis=1)
        return jnp.fft.irfft(fh, nz, axis=2).astype(div.dtype)

    def project_local(u):
        up = jnp.stack([_halo_pad_x(u[a], nshards) for a in range(3)])

        def mshift(a, d):
            v = up[a, 0:nx_loc] if d == 0 else up[a, 1 : 1 + nx_loc]
            if d > 0:
                v = jnp.roll(v, 1, axis=d)
            return v

        div = sum(
            (u[a] - mshift(a, a)) / dxs[a] for a in range(3)
        ) * vol
        p = poisson_pencil(div)
        pp = _halo_pad_x(p, nshards)

        def pshift(d):
            if d == 0:
                return pp[2 : 2 + nx_loc]
            return jnp.roll(p, -1, axis=d)

        G = jnp.stack([(pshift(a) - p) / dxs[a] for a in range(3)])
        return u - G

    def step_local(u, dt):
        ustart = u
        ku = []
        for i in range(ns):
            ku.append(convdiff_local(u))
            u = ustart
            for j in range(i + 1):
                u = u + dt * A[i][j] * ku[j]
            u = project_local(u)
        return u

    spec = P(None, AXIS, None, None)
    step_sharded = jax.jit(
        jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(spec, P()),
            out_specs=spec,
        ),
        donate_argnums=(0,),
    )

    def step(state, dt, theta=None):
        """NOTE: donates `state.u` for in-place stepping — don't reuse a
        state after stepping from it (keep `jnp.copy` if you must)."""
        del theta
        u = step_sharded(state.u, jnp.asarray(dt, setup.dtype))
        return StepperState(u=u, temp=None, t=state.t + dt, n=state.n + 1)

    return step
