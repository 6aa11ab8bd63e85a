"""Pallas TPU kernels for the hot stencils.

Hand-written fused kernel for the solver's dominant cost, the combined
convection-diffusion operator (reference hot kernel
`convection_diffusion_kernel!`, src/operators.jl:647-690), specialized to
uniform periodic grids (the 3D turbulence benchmark path) where all face
interpolation weights are exactly 1/2 and the metric terms are scalars.

Layout: Mosaic tiles the last two dims (sublane x lane = 8 x 128) and
rejects unaligned slices there, so the kernel works on the y/z-*interior*
field (extent n, lane-aligned for n % 128 == 0) where periodic stencil
shifts are exact circular `jnp.roll`s; only the x dim keeps a ghost layer
(untiled, freely sliceable) and is processed in overlapping slabs DMA'd
HBM -> VMEM. One read + one write of the field per evaluation.

The general (stretched/mixed-BC) path stays on the fused XLA slice graph
in ops/operators.py; dispatch happens in `convectiondiffusion`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "convdiff_periodic_uniform_3d",
    "convdiff_interior_3d",
    "pallas_supported",
]


def pallas_supported(setup):
    """Whether the fused Pallas path applies: TPU backend, 3D uniform
    periodic grid with lane-aligned interior extent."""
    g = setup.grid
    if g.dim != 3 or not (all(g.periodic) and all(g.uniform)):
        return False
    n = g.N[-1] - 2
    if n % 128 != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _convdiff3d_kernel(u_hbm, f_out, scratch, sem, *, visc, dx, bx):
    """One x-slab: DMA u[:, i*bx : i*bx+bx+2, :, :] (x-ghosted interior
    field), compute F for the bx x-planes of all three components."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(i * bx, bx + 2), :, :], scratch, sem
    )
    cp.start()
    cp.wait()

    def shift(a, sx, sy, sz):
        # x via (untiled) slab slicing, y/z via exact periodic roll
        # (pltpu.roll requires non-negative shifts; roll by size - s)
        v = scratch[a, 1 + sx : bx + 1 + sx, :, :]
        if sy:
            v = pltpu.roll(v, (-sy) % v.shape[1], 1)
        if sz:
            v = pltpu.roll(v, (-sz) % v.shape[2], 2)
        return v

    e = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for a in range(3):
        u_c = shift(a, 0, 0, 0)
        f = jnp.zeros_like(u_c)
        for b in range(3):
            sb = e[b]
            u_pb = shift(a, *sb)
            u_mb = shift(a, *(-s for s in sb))
            # Diffusion: nu (u+ - 2u + u-) / dx_b^2
            f += (visc / (dx[b] * dx[b])) * (u_pb - 2.0 * u_c + u_mb)
            # Convection (skew-symmetric form, weights 1/2)
            uab1 = 0.5 * (u_mb + u_c)
            uab2 = 0.5 * (u_c + u_pb)
            if a == b:
                uba1 = uab1
                uba2 = uab2
            else:
                sa = e[a]
                ub_c = shift(b, 0, 0, 0)
                ub_pa = shift(b, *sa)
                ub_mb = shift(b, *(-s for s in sb))
                ub_mb_pa = shift(b, *(x - y for x, y in zip(sa, sb)))
                uba1 = 0.5 * (ub_mb + ub_mb_pa)
                uba2 = 0.5 * (ub_c + ub_pa)
            f -= (uab2 * uba2 - uab1 * uba1) / dx[b]
        f_out[a, :, :, :] = f


def convdiff_interior_3d(u_int, visc, dx, *, bx=None, interpret=False):
    """Fused convection+diffusion on the ghost-free interior field
    (3, n, n, n) — the fast-path layout. Pads x by periodic wrap, runs the
    slab kernel, returns interior-shaped F."""
    D, n, ny, nz = u_int.shape
    assert D == 3 and n == ny == nz
    if bx is None:
        # VMEM heuristic: slab scratch 3*(bx+2)*n^2*4B plus temporaries
        bx = 8 if n <= 128 else 2
    while n % bx != 0:
        bx //= 2
    up = jnp.concatenate([u_int[:, -1:], u_int, u_int[:, :1]], axis=1)
    kernel = functools.partial(
        _convdiff3d_kernel, visc=float(visc), dx=tuple(map(float, dx)), bx=bx
    )
    return pl.pallas_call(
        kernel,
        grid=(n // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, n, n, n), u_int.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, bx + 2, n, n), u_int.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(up)


def convdiff_periodic_uniform_3d(u, visc, dx, *, bx=8, interpret=False):
    """Fused convection+diffusion on a uniform periodic 3D grid.

    `u`: ghosted `(3, n+2, n+2, n+2)` with periodic ghosts filled;
    `visc`, `dx`: python floats (static). Returns F with the same shape
    (zeros on ghost entries, like the slice-graph version).
    """
    D, nxg, nyg, nzg = u.shape
    assert D == 3 and nxg == nyg == nzg
    n = nxg - 2
    while n % bx != 0:
        bx //= 2
    grid = (n // bx,)

    # y/z-interior, x-ghosted layout (lane dim = n, tile-aligned)
    ux = u[:, :, 1:-1, 1:-1]

    kernel = functools.partial(
        _convdiff3d_kernel, visc=float(visc), dx=tuple(map(float, dx)), bx=bx
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, n, n, n), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, bx + 2, n, n), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ux)
    # Restore the ghost shape (ghost entries zero, as in the slice graph)
    return jnp.pad(out, ((0, 0),) + ((1, 1),) * 3)
