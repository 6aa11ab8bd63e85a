"""Filtered-DNS data generation for closure training.

Re-design of IncompressibleNavierStokes.jl
`lib/NeuralClosure/src/data_generation.jl`: a DNS burn-in, then a DNS run
with a `filtersaver` processor that, every `savefreq` steps, computes the
commutator error `c = Phi(F(u)) - F(Phi(u))` for each (LES grid, filter)
pair — the whole snapshot pipeline is one jitted function per pair.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..boundary_conditions import apply_bc_u
from ..ops.initializers import random_field, vectorfield
from ..ops.operators import momentum
from ..ops.pressure import default_psolver, project
from ..processors import Processor, timelogger
from ..setup import Setup
from ..solver import solve_unsteady
from ..time_steppers.rk_methods import RK44

__all__ = [
    "gaussian_force",
    "filtersaver",
    "create_les_data",
    "create_io_arrays",
]


def gaussian_force(setup, *, sigma=0.05, A=0.002, rng):
    """Random steady Gaussian body-force bump, periodically extended and
    mean-free (reference gaussian_force, data_generation.jl:2-33; 2D)."""
    g = setup.grid
    assert g.dim == 2
    (x0, x1), (y0, y1) = g.xlims
    Lx, Ly = x1 - x0, y1 - y0
    k1, k2, k3 = jax.random.split(rng, 3)
    xc = x0 + jax.random.uniform(k1, dtype=setup.dtype) * Lx
    yc = y0 + jax.random.uniform(k2, dtype=setup.dtype) * Ly
    phi = 2 * np.pi * jax.random.uniform(k3, dtype=setup.dtype)
    sx, sy = sigma * Lx, sigma * Ly
    full = tuple((0, n) for n in g.N)
    xs = jnp.reshape(g.xp[0], (-1, 1))
    ys = jnp.reshape(g.xp[1], (1, -1))
    f = 0.0
    for lx in (-Lx, 0.0, Lx):
        for ly in (-Ly, 0.0, Ly):
            f = f + A * jnp.exp(
                -((xs - xc - lx) ** 2) / (2 * sx**2)
                - ((ys - yc - ly) ** 2) / (2 * sy**2)
            )
    F = jnp.stack([jnp.sin(phi) * f, jnp.cos(phi) * f])
    return F - jnp.mean(F)


def filtersaver(
    dns, les, filters, compression, psolver_dns, psolver_les, *, nupdate=1
):
    """Processor computing filtered-DNS training pairs
    (reference filtersaver, data_generation.jl:60-121).

    Returns per (LES setup, filter) combination a dict with stacked
    `u` (filtered velocity) and `c` (commutator error) arrays.
    """
    combos = [
        (i, les_i, compression[i], psolver_les[i], phi)
        for i, les_i in enumerate(les)
        for phi in filters
    ]

    @jax.jit
    def dns_force(u, t):
        F = momentum(u, None, t, dns)
        F = apply_bc_u(F, t, dns, dudt=True)
        return project(F, dns, psolver=psolver_dns)

    def make_snapshot_fn(les_i, comp, psolver_i, phi):
        @jax.jit
        def snapshot(u, F, t):
            Phiu = phi(u, les_i, comp)
            Phiu = apply_bc_u(Phiu, t, les_i)
            PhiF = phi(F, les_i, comp)
            FPhi = momentum(Phiu, None, t, les_i)
            FPhi = apply_bc_u(FPhi, t, les_i, dudt=True)
            FPhi = project(FPhi, les_i, psolver=psolver_i)
            c = PhiF - FPhi
            return Phiu, c

        return snapshot

    snapshot_fns = [
        make_snapshot_fn(les_i, comp, ps, phi)
        for (_, les_i, comp, ps, phi) in combos
    ]

    def initialize(state):
        pstate = {
            "t": [],
            "u": [[] for _ in combos],
            "c": [[] for _ in combos],
            "comptime": time.time(),
        }
        return _update(pstate, state)

    def _update(pstate, state):
        u, t = state["u"], state["t"]
        F = dns_force(u, t)
        pstate["t"].append(float(t))
        for k, snap in enumerate(snapshot_fns):
            Phiu, c = snap(u, F, t)
            pstate["u"][k].append(np.asarray(Phiu))
            pstate["c"][k].append(np.asarray(c))
        return pstate

    def finalize(pstate, state):
        out = []
        for k in range(len(combos)):
            out.append(
                dict(
                    u=np.stack(pstate["u"][k]),
                    c=np.stack(pstate["c"][k]),
                    t=np.asarray(pstate["t"]),
                    comptime=time.time() - pstate["comptime"],
                )
            )
        return out

    return Processor(initialize, _update, finalize, nupdate)


def create_les_data(
    *,
    D,
    Re,
    lims,
    nles,
    ndns,
    filters,
    tburn,
    tsim,
    savefreq,
    dt=None,
    method=None,
    create_psolver=default_psolver,
    icfunc=None,
    rng,
    dtype=jnp.float32,
    processors=None,
    **kwargs,
):
    """Generate filtered-DNS data (reference create_les_data,
    data_generation.jl:126-226)."""
    if method is None:
        method = RK44()
    compression = [ndns // n for n in nles]
    assert all(c * n == ndns for c, n in zip(compression, nles))

    def make(n):
        x = tuple(np.linspace(lims[0], lims[1], n + 1) for _ in range(D))
        return Setup(x=x, Re=Re, dtype=dtype, **kwargs)

    dns = make(ndns)
    les = [make(n) for n in nles]
    psolver = create_psolver(dns)
    psolver_les = [create_psolver(s) for s in les]

    if icfunc is None:
        ustart = jax.jit(lambda k: random_field(dns, psolver=psolver, rng=k))(
            rng
        )
    else:
        ustart = icfunc(dns, psolver, rng)

    if bool(jnp.any(jnp.isnan(ustart))):
        print("Warning: initial conditions contain NaNs")

    base_procs = dict(
        processors
        if processors is not None
        else {"log": timelogger(nupdate=10)}
    )

    # Burn-in
    state, _ = solve_unsteady(
        setup=dns,
        ustart=ustart,
        tlims=(0.0, tburn),
        dt=dt,
        method=method,
        psolver=psolver,
        processors=base_procs,
        docopy=False,
    )

    # DNS with filter saver
    fsaver = filtersaver(
        dns, les, filters, compression, psolver, psolver_les, nupdate=savefreq
    )
    state2 = state._replace(t=jnp.asarray(0.0, dtype), n=jnp.asarray(0))
    _, outputs = solve_unsteady(
        setup=dns,
        ustart=state2.u,
        tlims=(0.0, tsim),
        dt=dt,
        method=method,
        psolver=psolver,
        processors={**base_procs, "f": fsaver},
        docopy=False,
    )
    return outputs["f"]


def create_io_arrays(data, setup):
    """Extract interior (ubar, c) training arrays, batch-first NHWC
    `(nsample, *n, D)` (reference create_io_arrays,
    data_generation.jl:231-252)."""
    g = setup.grid
    D = g.dim
    inside = g.Iu[0]
    assert all(box == inside for box in g.Iu)
    sl = (slice(None), slice(None)) + tuple(slice(s, e) for (s, e) in inside)
    out = {}
    for key in ("u", "c"):
        arrs = []
        for traj in data:
            a = traj[key][sl]  # (nt, D, *n)
            arrs.append(np.moveaxis(a, 1, -1))  # (nt, *n, D)
        out[key] = np.concatenate(arrs, axis=0)
    return out
