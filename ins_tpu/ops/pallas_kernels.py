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
    "stage_div_3d",
    "momentum_stage_div_3d",
    "momentum_stage_divhat_3d",
    "momentum_stage_divhat_halo_3d",
    "pcmsd_hat_3d",
    "pcmsd_hat_halo_3d",
    "pressure_correct_3d",
    "pressure_correct_qhat_3d",
    "pressure_correct_qhat_halo_3d",
    "smagorinsky_force_3d",
    "smagorinsky_force_halo_3d",
    "pallas_supported",
    "RECON",
]

# Sentinel for `pcmsd_hat_3d(streams=(RECON, ...))`: the tableau base is
# the kernel's own reconstructed velocity (no ustart DMA stream) — the
# step-boundary merge, where the final pressure correction of step s
# rides stage 0 of step s+1.
RECON = object()


def _pick_bx(nx, planes_of_bx, plane_elems=None, budget_bytes=96 * 1024 * 1024,
             candidates=(8, 4, 2, 1)):
    """Deepest slab depth whose VMEM footprint (`planes_of_bx(bx)` planes
    of `plane_elems` f32, default nx*nx for cubes) fits the budget.
    Probed at 256^3 (benchmarks/bx_probe.py): stage cost falls
    monotonically with bx (ghost re-reads amortize as (bx+3)/bx), so take
    the largest that fits.  Cube kernels cap at 8 (deeper slabs measured
    flat-to-worse at 256³); the channel kernels pass deeper candidates —
    their planes are 4× smaller, so per-window DMA-issue overhead still
    matters at bx=8 (measured: msd 1.22 → 1.19 ms at bx=16)."""
    if plane_elems is None:
        plane_elems = nx * nx
    for bx in candidates:
        if nx % bx == 0 and planes_of_bx(bx) * plane_elems * 4 <= budget_bytes:
            return bx
    return 1


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prep_mat(m_ref, manualhigh):
    """Hoisted per-kernel transform-matrix prep: bf16 (hi, lo) split on
    the manualhigh path, the raw f32 matrix otherwise (so "highest" is
    genuinely f32-exact — rebuilding f32 from the split loses ~2^-18)."""
    m = m_ref[...]
    return _split_bf16(m) if manualhigh else m


def _mm_h(a, b_p, manualhigh):
    """Plane matmul a @ b with b prepared by `_prep_mat`.
    manualhigh: 3 bf16 MXU passes (~Precision.HIGH); else HIGHEST in the
    input dtype (f32 on hardware; f64-exact in interpret-mode tests)."""
    if not manualhigh:
        return jnp.dot(
            a,
            b_p,
            # promote sub-f32 inputs (bf16) so "highest" never accumulates
            # less precisely than manualhigh; f64 stays f64 for interpret
            preferred_element_type=jnp.promote_types(a.dtype, jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    ah, al = _split_bf16(a)
    bh, bl = b_p
    kw = dict(preferred_element_type=jnp.float32)
    return jnp.dot(ah, bh, **kw) + jnp.dot(ah, bl, **kw) + jnp.dot(al, bh, **kw)


def _mm_h_left(a_p, b, manualhigh):
    """Plane matmul a @ b with a prepared by `_prep_mat`."""
    if not manualhigh:
        return jnp.dot(
            a_p,
            b,
            preferred_element_type=jnp.promote_types(b.dtype, jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    bh, bl = _split_bf16(b)
    ah, al = a_p
    kw = dict(preferred_element_type=jnp.float32)
    return jnp.dot(ah, bh, **kw) + jnp.dot(ah, bl, **kw) + jnp.dot(al, bh, **kw)


def _rp(v, axis):  # v[I + e_axis] (y/z periodic roll)
    return pltpu.roll(v, v.shape[axis] - 1, axis)


def _rm(v, axis):  # v[I - e_axis]
    return pltpu.roll(v, 1, axis)


def _convdiff_window(at, visc, dx, a):
    """Fused convection+diffusion for component ``a`` on an x-plane
    window.  ``at(a, lo_sh, hi_off)`` returns planes [lo_sh, W+hi_off)
    of the (W = bx+3)-plane component window (shifted-flux convection;
    see `_convdiff3d_kernel` docs).  Returns f on the center bx+1
    planes."""
    u_c = at(a, 1, -1)
    uE = at(a, 0, 0)
    uab2E = 0.5 * (uE[:-1] + uE[1:])
    if a == 0:
        ubaE = uab2E
    else:
        uxE = at(0, 0, -1)
        ubaE = 0.5 * (uxE + _rp(uxE, a))
    phiE = uab2E * ubaE
    f = (phiE[:-1] - phiE[1:]) / dx[0]
    f += (visc / (dx[0] * dx[0])) * (at(a, 2, 0) - 2.0 * u_c + at(a, 0, -2))
    for b in (1, 2):
        u_pb = _rp(u_c, b)
        f += (visc / (dx[b] * dx[b])) * (u_pb - 2.0 * u_c + _rm(u_c, b))
        uab2 = 0.5 * (u_c + u_pb)
        if a == b:
            uba2 = uab2
        else:
            ub_c = at(b, 1, -1)
            ub_pa = at(b, 2, 0) if a == 0 else _rp(ub_c, a)
            uba2 = 0.5 * (ub_c + ub_pa)
        phi = uab2 * uba2
        f -= (phi - _rm(phi, b)) / dx[b]
    return f


def pallas_supported(setup):
    """Whether the per-op slab kernels apply (conv-diff, stage+div,
    pressure-correct, Smagorinsky): TPU backend, 3D uniform periodic
    grid, lane-aligned z extent and sublane-aligned y extent (any box —
    x slabs are untiled).  The *fused-projection* stage chain
    additionally needs a cube (`fused_cube_supported`)."""
    g = setup.grid
    if g.dim != 3 or not (all(g.periodic) and all(g.uniform)):
        return False
    ny, nz = g.N[1] - 2, g.N[2] - 2
    if nz % 128 != 0 or ny % 8 != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_cube_supported(setup):
    """Whether the fully-fused stage chain (in-kernel z/y eigen
    transforms + Poisson pass B) applies: `pallas_supported` on a
    lane-aligned cube."""
    g = setup.grid
    if not pallas_supported(setup):
        return False
    n = g.N[-1] - 2
    return n % 128 == 0 and all(g.N[d] == g.N[-1] for d in range(3))


def _convdiff3d_kernel(u_hbm, f_out, scratch, sems, *, visc, dx, bx, n):
    """One x-slab of the fused convection-diffusion evaluation.

    Double-buffered: while slab i computes from `scratch[i % 2]`, the
    three DMAs for slab i+1 (bx interior planes + the two periodic
    neighbour planes, wrapped modularly so the caller needs NO ghost
    concat pass) stream into `scratch[(i+1) % 2]`.

    Convection uses the shifted-flux identity: the lower-face flux
    uab1*uba1 at I equals the upper-face flux uab2*uba2 at I-e_b, so each
    direction computes ONE flux product and differences it against its
    own shift — about half the VPU multiplies of the naive form.
    """
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    # ring-carry (see _msd_hat_kernel): window j > 0 re-uses its 2 low
    # planes (globals start-1, start) from window j-1's buffer
    def u_full(s):
        cps = [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(n - 1, 1)],
                scratch.at[s, :, pl.ds(0, 1)], sems.at[s, 0],
            )
        ]
        if nslab == 1:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx)],
                scratch.at[s, :, pl.ds(1, bx)], sems.at[s, 1],
            ))
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, 1)],
                scratch.at[s, :, pl.ds(bx + 1, 1)], sems.at[s, 2],
            ))
        else:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx + 1)],
                scratch.at[s, :, pl.ds(1, bx + 1)], sems.at[s, 1],
            ))
        return cps

    def u_part(j, s):
        start = j * bx
        cps = []
        if bx > 1:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start + 1, bx - 1)],
                scratch.at[s, :, pl.ds(2, bx - 1)], sems.at[s, 0],
            ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start + bx) % n, 1)],
            scratch.at[s, :, pl.ds(bx + 1, 1)], sems.at[s, 1],
        ))
        return cps

    @pl.when(i == 0)
    def _():
        for cp in u_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in u_part(i + 1, 1 - slot):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in u_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in u_part(i, slot):
            cp.wait()

    @pl.when(i + 1 < nslab)
    def _():
        scratch[1 - slot, :, 0:2] = scratch[slot, :, bx : bx + 2]

    def at(a, lo_sh, hi_off):
        # x-plane window [lo_sh, bx + hi_off] in ghosted local coords
        return scratch[slot, a, lo_sh : bx + 2 + hi_off, :, :]

    def rp(v, axis):  # v[I + e_axis] (y/z periodic roll)
        return pltpu.roll(v, v.shape[axis] - 1, axis)

    def rm(v, axis):  # v[I - e_axis]
        return pltpu.roll(v, 1, axis)

    for a in range(3):
        u_c = at(a, 1, -1)  # center planes
        # --- b = x: fluxes on the extended window [0, bx] then diff
        uE = at(a, 0, 0)  # planes [-1 .. bx]
        uab2E = 0.5 * (uE[:-1] + uE[1:])  # face value, planes [-1 .. bx-1]
        if a == 0:
            ubaE = uab2E
        else:
            uxE = at(0, 0, -1)  # u_x planes [-1 .. bx-1]
            ubaE = 0.5 * (uxE + rp(uxE, a))
        phiE = uab2E * ubaE
        f = (phiE[:-1] - phiE[1:]) / dx[0]
        f += (visc / (dx[0] * dx[0])) * (
            at(a, 2, 0) - 2.0 * u_c + at(a, 0, -2)
        )
        # --- b = y, z: lane/sublane rolls on the center window
        for b in (1, 2):
            u_pb = rp(u_c, b)
            f += (visc / (dx[b] * dx[b])) * (u_pb - 2.0 * u_c + rm(u_c, b))
            uab2 = 0.5 * (u_c + u_pb)
            if a == b:
                uba2 = uab2
            else:
                ub_c = at(b, 1, -1)
                # u_b(I + e_a): a=0 -> x-plane shift; else y/z roll
                ub_pa = at(b, 2, 0) if a == 0 else rp(ub_c, a)
                uba2 = 0.5 * (ub_c + ub_pa)
            phi = uab2 * uba2
            f -= (phi - rm(phi, b)) / dx[b]
        f_out[a, :, :, :] = f


def convdiff_interior_3d(u_int, visc, dx, *, bx=None, interpret=False):
    """Fused convection+diffusion on the ghost-free interior field
    (3, nx, ny, nz) — the fast-path layout (any box; x wraps
    periodically, so halo-padded shard blocks just discard the two edge
    output planes).  Returns interior-shaped F."""
    D, nx, ny, nz = u_int.shape
    assert D == 3
    if bx is None:
        # VMEM heuristic: double-buffered scratch 2*3*(bx+2)*ny*nz*4B
        # plus the pipelined output block and temporaries
        bx = _pick_bx(nx, lambda b: 12 * b + 12, ny * nz)
    while nx % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _convdiff3d_kernel,
        visc=float(visc),
        dx=tuple(map(float, dx)),
        bx=bx,
        n=nx,
    )
    return pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), u_int.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 2, ny, nz), u_int.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(u_int)


def convdiff_periodic_uniform_3d(u, visc, dx, *, bx=8, interpret=False):
    """Fused convection+diffusion on a uniform periodic 3D grid.

    `u`: ghosted `(3, n+2, n+2, n+2)` with periodic ghosts filled;
    `visc`, `dx`: python floats (static). Returns F with the same shape
    (zeros on ghost entries, like the slice-graph version).
    """
    D, nxg, nyg, nzg = u.shape
    assert D == 3
    n = nxg - 2
    while n % bx != 0:
        bx //= 2

    # Interior layout (ghosts dropped; the kernel wraps x modularly)
    out = convdiff_interior_3d(
        u[:, 1:-1, 1:-1, 1:-1], visc, dx, bx=bx, interpret=interpret
    )
    # Restore the ghost shape (ghost entries zero, as in the slice graph)
    return jnp.pad(out, ((0, 0),) + ((1, 1),) * 3)


# ---------------------------------------------------------------------------
# Stage-glue kernels: the RK stage update and the pressure correction.
#
# Why these exist: XLA lowers `jnp.roll` on TPU as an unfused copy — one
# 256^3 roll costs more than a full read+write pass of the array — so the
# reference's per-stage glue (tableau axpy -> divergence -> gradient ->
# subtract; step_explicit_runge_kutta.jl:36-50, pressure.jl:52-82) spends
# most of the step in data movement. These two slab kernels compute the
# same math in one HBM pass each, with the periodic shifts as in-VMEM
# rolls / window slices like the conv-diff kernel above.
# ---------------------------------------------------------------------------


def _stage_div_kernel(
    coeff_smem, base_hbm, k_hbm, ut_out, div_out, sb, sk, sems, *, dx, vol, bx, n
):
    """ut = base + coeff*k and divvol = vol * div(ut) in one pass.

    Windows carry ONE lower ghost plane per stream (divergence at plane p
    needs ut_x[p-1]); y/z lower neighbours are in-VMEM rolls."""
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    # ring-carry: each stream's 1 low ghost plane (global start-1) is
    # window j-1's top plane — VMEM-copied, not re-read from HBM
    def s_main(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(start, bx)],
                sb.at[s, :, pl.ds(1, bx)], sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                k_hbm.at[:, pl.ds(start, bx)],
                sk.at[s, :, pl.ds(1, bx)], sems.at[s, 2],
            ),
        ]

    def s_lo(s):
        return [
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(n - 1, 1)],
                sb.at[s, :, pl.ds(0, 1)], sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                k_hbm.at[:, pl.ds(n - 1, 1)],
                sk.at[s, :, pl.ds(0, 1)], sems.at[s, 3],
            ),
        ]

    @pl.when(i == 0)
    def _():
        for cp in s_main(0, 0) + s_lo(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in s_main(i + 1, 1 - slot):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in s_main(0, 0) + s_lo(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in s_main(i, slot):
            cp.wait()

    @pl.when(i + 1 < nslab)
    def _():
        sb[1 - slot, :, 0:1] = sb[slot, :, bx : bx + 1]
        sk[1 - slot, :, 0:1] = sk[slot, :, bx : bx + 1]

    c = coeff_smem[0]
    d = None
    for a in range(3):
        utw = sb[slot, a] + c * sk[slot, a]  # (bx+1, n, n) incl lower ghost
        ut_c = utw[1:]
        ut_out[a, :, :, :] = ut_c
        if a == 0:
            d = (utw[1:] - utw[:-1]) / dx[0]
        else:
            d += (ut_c - pltpu.roll(ut_c, 1, a)) / dx[a]
    div_out[:, :, :] = d * vol


def stage_div_3d(base_int, k_int, coeff, dxs, *, bx=None, interpret=False):
    """Fused RK stage update + divergence on interior-layout fields:
    `ut = base + coeff * k`, `divvol = vol * div(ut)` (one HBM pass).
    `coeff` is a traced scalar (e.g. dt * A[i][i]).  Any (nx, ny, nz)
    box; x wraps periodically (halo-padded shard blocks discard the two
    edge output planes)."""
    D, nx, ny, nz = base_int.shape
    assert D == 3
    vol = float(np.prod(dxs))
    if bx is None:
        bx = _pick_bx(nx, lambda b: 20 * b + 12, ny * nz)
    while nx % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _stage_div_kernel, dx=tuple(map(float, dxs)), vol=vol, bx=bx, n=nx
    )
    coeff_arr = jnp.reshape(coeff, (1,)).astype(base_int.dtype)
    return pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, nx, ny, nz), base_int.dtype),
            jax.ShapeDtypeStruct((nx, ny, nz), base_int.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 1, ny, nz), base_int.dtype),
            pltpu.VMEM((2, 3, bx + 1, ny, nz), base_int.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(coeff_arr, base_int, k_int)


def _momentum_stage_div_kernel(
    coeff_smem, u_hbm, base_hbm, k_out, ut_out, div_out, su, sb, sems,
    *, visc, dx, vol, bx, n,
):
    """Fused momentum + RK stage + divergence, one HBM pass.

    Computes k = convdiff(u) on the extended window [start-1, start+bx)
    (one recomputed plane), ut = base + coeff*k on the same window, then
    div(ut)*vol on [start, start+bx) — so the stage's k never makes an
    HBM round-trip between the momentum eval and the stage update
    (reference flow: momentum! then the tableau axpy,
    step_explicit_runge_kutta.jl:36-50, as separate sweeps).

    Windows: u needs planes [start-2, start+bx] (bx+3, wrapped); base
    needs [start-1, start+bx) (bx+1).  k IS still written out (later RK
    stages read it for their tableau combinations), but only the
    [start, start+bx) planes.
    """
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    def copies(j, s):
        start = j * bx
        lo1 = (start - 1 + n) % n
        lo2 = (start - 2 + n) % n
        hi = (start + bx) % n
        return (
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start, bx)],
                su.at[s, :, pl.ds(2, bx)],
                sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(lo1, 1)],
                su.at[s, :, pl.ds(1, 1)],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(lo2, 1)],
                su.at[s, :, pl.ds(0, 1)],
                sems.at[s, 2],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(hi, 1)],
                su.at[s, :, pl.ds(bx + 2, 1)],
                sems.at[s, 3],
            ),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(start, bx)],
                sb.at[s, :, pl.ds(1, bx)],
                sems.at[s, 4],
            ),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(lo1, 1)],
                sb.at[s, :, pl.ds(0, 1)],
                sems.at[s, 5],
            ),
        )

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in copies(i + 1, (i + 1) % 2):
            cp.start()

    for cp in copies(i, slot):
        cp.wait()

    # Local plane coords in su: [0 .. bx+2] <-> global [start-2 .. start+bx].
    # k is computed on locals [1 .. bx+1) of the OUTPUT window, i.e. the
    # convdiff window slices below mirror _convdiff3d_kernel shifted by -1.
    def at(a, lo_sh, hi_off):
        # planes [lo_sh, bx+3+hi_off) of the (bx+3)-plane window
        return su[slot, a, lo_sh : bx + 3 + hi_off, :, :]

    def rp(v, axis):
        return pltpu.roll(v, v.shape[axis] - 1, axis)

    def rm(v, axis):
        return pltpu.roll(v, 1, axis)

    c = coeff_smem[0]
    d = None
    for a in range(3):
        # convdiff on center window locals [1, bx+2) (bx+1 planes)
        u_c = at(a, 1, -1)
        uE = at(a, 0, 0)  # locals [0, bx+3) = bx+3 planes
        uab2E = 0.5 * (uE[:-1] + uE[1:])  # faces at locals [0, bx+2)
        if a == 0:
            ubaE = uab2E
        else:
            uxE = at(0, 0, -1)  # u_x locals [0, bx+2)
            ubaE = 0.5 * (uxE + rp(uxE, a))
        phiE = uab2E * ubaE
        f = (phiE[:-1] - phiE[1:]) / dx[0]
        f += (visc / (dx[0] * dx[0])) * (
            at(a, 2, 0) - 2.0 * u_c + at(a, 0, -2)
        )
        for b in (1, 2):
            u_pb = rp(u_c, b)
            f += (visc / (dx[b] * dx[b])) * (u_pb - 2.0 * u_c + rm(u_c, b))
            uab2 = 0.5 * (u_c + u_pb)
            if a == b:
                uba2 = uab2
            else:
                ub_c = at(b, 1, -1)
                ub_pa = at(b, 2, 0) if a == 0 else rp(ub_c, a)
                uba2 = 0.5 * (ub_c + ub_pa)
            phi = uab2 * uba2
            f -= (phi - rm(phi, b)) / dx[b]
        # f covers globals [start-1, start+bx); outputs take [start, ...)
        k_out[a, :, :, :] = f[1:]
        utw = sb[slot, a] + c * f  # ut on globals [start-1, start+bx)
        ut_c = utw[1:]
        ut_out[a, :, :, :] = ut_c
        if a == 0:
            d = (utw[1:] - utw[:-1]) / dx[0]
        else:
            d += (ut_c - rm(ut_c, a)) / dx[a]
    div_out[:, :, :] = d * vol


def momentum_stage_div_3d(
    u_int, base_int, coeff, visc, dxs, *, bx=None, interpret=False
):
    """Fused momentum + RK stage update + divergence on interior-layout
    periodic-uniform fields (one HBM pass):

        k   = convdiff(u)
        ut  = base + coeff * k
        div = vol * divergence(ut)

    Returns ``(k, ut, div)``.  ``coeff`` is a traced scalar."""
    D, n, ny, nz = u_int.shape
    assert D == 3 and n == ny == nz
    vol = float(np.prod(dxs))
    if bx is None:
        bx = _pick_bx(n, lambda b: 26 * b + 24)
    while n % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _momentum_stage_div_kernel,
        visc=float(visc),
        dx=tuple(map(float, dxs)),
        vol=vol,
        bx=bx,
        n=n,
    )
    coeff_arr = jnp.reshape(coeff, (1,)).astype(u_int.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n, n, n), u_int.dtype),
            jax.ShapeDtypeStruct((3, n, n, n), u_int.dtype),
            jax.ShapeDtypeStruct((n, n, n), u_int.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 3, n, n), u_int.dtype),
            pltpu.VMEM((2, 3, bx + 1, n, n), u_int.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(coeff_arr, u_int, base_int)


def _msd_hat_kernel(
    coeffs_smem, u_hbm, *args,
    visc, dx, vol, bx, n, manualhigh, m, emit_k=True, with_usnew=False,
    with_bf=False, with_accbase=False, u_is_stream0=False,
    smag_d2=None, tparams=None,
):
    """_momentum_stage_div_kernel + in-kernel tableau accumulation +
    z/y forward eigen-transform of the divergence.

    The stage base is accumulated from its raw streams (`ustart` plus the
    ``m`` earlier-stage k's with nonzero tableau entries) INSIDE the
    kernel — the XLA axpy that previously materialized `base` cost up to
    15 full-field HBM passes per RK44 step.  Outputs divhat[p] =
    Vinv_y @ (div[p] @ Vinv_z^T) per x-plane, so the Poisson solve's
    pass A never re-reads div from HBM.

    Ring-carry slab pipeline: the x-grid is sequential, so window j > 0
    re-uses its 3 low u planes (and each stream's 1 low plane) from
    window j-1's just-completed buffer via a VMEM copy instead of
    re-reading them from HBM — total HBM reads are exactly ONE pass of
    each field regardless of bx (the (bx+3)/bx ghost re-read factor that
    dominated at 512^3's bx=2 is gone).

    ``emit_k=False`` drops the k output (the final stage's k is never
    read).  ``with_usnew`` adds output base + coeffs[-1]*k (the
    low-storage accumulator update, fused instead of a separate 3-read
    axpy pass; its coefficient rides at the END of the SMEM array).
    ``with_bf``: a steady body-force field rides as one more DMA stream
    (coefficient 1, part of k).  ``with_accbase``: the usnew base is a
    SEPARATE stream (the RK b-row accumulator) riding last.
    ``u_is_stream0``: ustart IS u (stage 0) — its window is read from
    the u scratch instead of a second DMA stream (m must be 0).
    ``tparams``: Boussinesq temperature riding the same pass —
    ``(gdir, alpha2, alpha4, dis, t_elide, with_tacc, with_tempnew)``;
    the temp field / tempstart / tempacc HBM refs follow the u streams
    in ``args`` (``t_elide``: tempstart IS the temp field, no stream),
    the temp_out / tempnew outputs ride after usnew, and the temp
    window (ghosts (1, 1)) gets its own ring-carried scratch."""
    n_dma = (0 if u_is_stream0 else m + 1) + with_bf + with_accbase
    streams = args[:n_dma]     # [ustart, k_1..k_m][, bodyforce][, accbase]
    with_temp = tparams is not None
    if with_temp:
        (t_gdir, t_alpha2, t_alpha4, t_dis,
         t_elide, with_tacc, with_tempnew) = tparams
        nts = (0 if t_elide else 1) + with_tacc
        t_hbm = args[n_dma]
        t_streams = args[n_dma + 1 : n_dma + 1 + nts]
        args = args[:n_dma] + args[n_dma + 1 + nts :]
    else:
        nts = 0
        with_tempnew = False
    vinvy_hbm = args[n_dma]
    vinvzT_hbm = args[n_dma + 1]
    nout = emit_k + 2 + with_usnew + with_temp + with_tempnew
    outs = list(args[n_dma + 2 : n_dma + 2 + nout])
    rest = args[n_dma + 2 + nout :]
    k_out = outs.pop(0) if emit_k else None
    ut_out = outs.pop(0)
    divhat_out = outs.pop(0)
    usnew_out = outs.pop(0) if with_usnew else None
    temp_out = outs.pop(0) if with_temp else None
    tempnew_out = outs.pop(0) if with_tempnew else None
    rest = list(rest)
    su = rest.pop(0)
    sb = rest.pop(0) if n_dma else None
    st = rest.pop(0) if with_temp else None
    stb = rest.pop(0) if nts else None
    sems = rest.pop(0)

    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2
    with_smag = smag_d2 is not None
    # u-window ghost widths: the conv-diff stencil needs x-radius (2, 1)
    # around the (bx+1)-plane momentum eval; the fused Smagorinsky force
    # widens it to (3, 2).  Positions [0, W) <-> globals
    # [start-ng_lo, start+bx+ng_hi-1]; streams: positions [0, bx] <->
    # globals [start-1, start+bx-1].
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    W = bx + ng

    def u_full(s):
        # window 0 (the only one whose low planes wrap)
        cps = [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(n - ng_lo, ng_lo)],
                su.at[s, :, pl.ds(0, ng_lo)], sems.at[s, 0],
            )
        ]
        if nslab == 1:
            assert ng_hi == 1, "single-window smag slab unsupported"
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx)],
                su.at[s, :, pl.ds(ng_lo, bx)], sems.at[s, 1],
            ))
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, 1)],
                su.at[s, :, pl.ds(W - 1, 1)], sems.at[s, 2],
            ))
        else:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx + ng_hi)],
                su.at[s, :, pl.ds(ng_lo, bx + ng_hi)], sems.at[s, 1],
            ))
        return cps

    def u_part(j, s):
        # window j > 0: positions 0..ng-1 carried; DMA only the new
        # planes (the last ng_hi may wrap)
        start = j * bx
        cps = []
        if bx > ng_hi:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start + ng_hi, bx - ng_hi)],
                su.at[s, :, pl.ds(ng, bx - ng_hi)], sems.at[s, 0],
            ))
        for t in range(ng_hi):
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds((start + bx + t) % n, 1)],
                su.at[s, :, pl.ds(W - ng_hi + t, 1)], sems.at[s, 1 + t],
            ))
        return cps

    def s_full(s):
        cps = []
        for q in range(n_dma):
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(0, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, 3 + 2 * q],
            ))
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(n - 1, 1)],
                sb.at[s, q, :, pl.ds(0, 1)], sems.at[s, 4 + 2 * q],
            ))
        return cps

    def s_part(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(start, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, 3 + 2 * q],
            )
            for q in range(n_dma)
        ]

    # temp window (ghosts (1, 1)): positions [0, bx+2) <-> globals
    # [start-1, start+bx]; temp streams: [0, bx) <-> [start, start+bx)
    # (no ghosts, no wrap)
    t0 = 3 + 2 * n_dma

    def t_full(s):
        if not with_temp:
            return []
        cps = [
            pltpu.make_async_copy(
                t_hbm.at[pl.ds(n - 1, 1)], st.at[s, pl.ds(0, 1)],
                sems.at[s, t0],
            ),
        ]
        if nslab == 1:  # the single window's top ghost wraps
            cps.append(pltpu.make_async_copy(
                t_hbm.at[pl.ds(0, bx)], st.at[s, pl.ds(1, bx)],
                sems.at[s, t0 + 1],
            ))
            cps.append(pltpu.make_async_copy(
                t_hbm.at[pl.ds(0, 1)], st.at[s, pl.ds(bx + 1, 1)],
                sems.at[s, t0 + 2 + nts],
            ))
        else:
            cps.append(pltpu.make_async_copy(
                t_hbm.at[pl.ds(0, bx + 1)], st.at[s, pl.ds(1, bx + 1)],
                sems.at[s, t0 + 1],
            ))
        for q in range(nts):
            cps.append(pltpu.make_async_copy(
                t_streams[q].at[pl.ds(0, bx)], stb.at[s, q],
                sems.at[s, t0 + 2 + q],
            ))
        return cps

    def t_part(j, s):
        if not with_temp:
            return []
        start = j * bx
        cps = []
        if bx > 1:
            cps.append(pltpu.make_async_copy(
                t_hbm.at[pl.ds(start + 1, bx - 1)],
                st.at[s, pl.ds(2, bx - 1)], sems.at[s, t0],
            ))
        cps.append(pltpu.make_async_copy(
            t_hbm.at[pl.ds((start + bx) % n, 1)],
            st.at[s, pl.ds(bx + 1, 1)], sems.at[s, t0 + 1],
        ))
        for q in range(nts):
            cps.append(pltpu.make_async_copy(
                t_streams[q].at[pl.ds(start, bx)], stb.at[s, q],
                sems.at[s, t0 + 2 + q],
            ))
        return cps

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + s_full(0) + t_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in (u_part(i + 1, 1 - slot) + s_part(i + 1, 1 - slot)
                   + t_part(i + 1, 1 - slot)):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + s_full(0) + t_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in u_part(i, slot) + s_part(i, slot) + t_part(i, slot):
            cp.wait()

    # ring carry: seed window i+1's low planes from window i's buffer
    # (complete after the waits above; the in-flight partial DMAs into
    # slot 1-slot target disjoint plane ranges)
    @pl.when(i + 1 < nslab)
    def _():
        su[1 - slot, :, 0:ng] = su[slot, :, bx : bx + ng]
        for q in range(n_dma):
            sb[1 - slot, q, :, 0:1] = sb[slot, q, :, bx : bx + 1]
        if with_temp:
            st[1 - slot, 0:2] = st[slot, bx : bx + 2]

    off = ng_lo - 2  # conv-diff sub-window offset inside the u window

    def at(a, lo_sh, hi_off):
        # promote sub-f32 (bf16-stored) windows so the stencil math runs
        # in f32 (no-op astype for f32/f64 storage)
        x = su[slot, a, off + lo_sh : off + bx + 3 + hi_off, :, :]
        return x.astype(jnp.promote_types(x.dtype, jnp.float32))

    if u_is_stream0:
        base = lambda a: su[slot, a, off + 1 : off + bx + 2]  # noqa: E731
        idx_bf = 0
    else:
        base = lambda a: sb[slot, 0, a]  # noqa: E731
        idx_bf = m + 1
    idx_acc = idx_bf + with_bf

    _stage_tail(
        at, coeffs_smem,
        k_out, ut_out, divhat_out, usnew_out,
        vinvy_hbm, vinvzT_hbm,
        visc=visc, dx=dx, vol=vol, bx=bx, m=m, manualhigh=manualhigh,
        emit_k=emit_k, with_usnew=with_usnew,
        base=base,
        kstream=lambda q, a: sb[slot, q, a],
        bf=(lambda a: sb[slot, idx_bf, a]) if with_bf else None,
        usnew_base=(lambda a: sb[slot, idx_acc, a]) if with_accbase else None,
        smag=(
            (coeffs_smem[m + 1 + with_usnew], smag_d2,
             lambda a: su[slot, a, 0:W].astype(
                 jnp.promote_types(su.dtype, jnp.float32)))
            if with_smag
            else None
        ),
        temp=(
            (st[slot],
             None if t_elide else stb[slot, 0],
             stb[slot, 0 if t_elide else 1] if with_tacc else None,
             temp_out, tempnew_out,
             t_gdir, t_alpha2, t_alpha4, t_dis)
            if with_temp
            else None
        ),
    )


def _stage_tail(
    at, coeffs_smem, k_out, ut_out, divhat_out, usnew_out,
    vinvy_hbm, vinvzT_hbm,
    *, visc, dx, vol, bx, m, manualhigh, emit_k, with_usnew,
    base=None, kstream=None, bf=None, acc=None, usnew_base=None,
    smag=None, temp=None,
):
    """Shared stage tail: conv-diff on the window, optional k / usnew
    outputs, tableau accumulation, divergence, z/y forward transform.
    ``base(a)``: accessor for the (bx+1)-plane ustart window;
    ``kstream(q, a)``: accessor for earlier-stage k windows (q=1..m).
    ``bf``: optional per-component accessor for a steady body-force
    window (added to the momentum eval, so part of k).
    ``acc``: optional per-component accessor for an already-accumulated
    base window (the streaming kernel folds the tableau streams as they
    land instead of holding them all; with ``with_usnew`` the caller
    guarantees m == 0 so acc IS the ustart window).
    ``usnew_base``: optional accessor for a SEPARATE usnew base window
    (the RK b-row accumulator: usnew = usnew_base + c*k instead of
    ustart + c*k).
    ``smag``: optional ``(theta, d2, ufull)`` — the natural-form
    Smagorinsky force computed IN the stage kernel from the widened
    (bx+5)-plane u window accessor ``ufull(a)`` (x-radius 2; reference
    runs it as a separate sweep, src/eddyviscosity.jl:48-156) and added
    to the momentum eval.
    ``temp``: optional ``(tw, tstart, tacc, temp_out, tempnew_out,
    gdir, alpha2, alpha4, dis)`` — Boussinesq temperature riding the
    SAME kernel pass (reference treats the temperature RHS as
    first-class in the hot loop, src/operators.jl:711-808, 916-931):
    ``tw`` is the (bx+2)-plane temp window (positions [0, bx+2) <->
    globals [start-1, start+bx]), ``tstart`` the (bx)-plane tableau
    base window (None: read it from ``tw``), ``tacc`` the optional
    separate accumulator base (the temp b-row mirror of
    ``usnew_base``).  The buoyancy force alpha2*avg_gdir(T) is added
    to the momentum eval, and the temperature RHS (convection +
    alpha4-diffusion + optional ``dis``-coefficient dissipation, which
    re-derives the velocity Laplacian from the u window — the ghost
    widths (2, 1) exactly cover it) advances with the stage's own
    tableau coefficients (coeffs[m] / coeffs[m+1])."""
    smf = None
    if smag is not None:
        theta, d2, ufull = smag
        smf = _smag_body(
            ufull(0), ufull(1), ufull(2), theta,
            dx=dx, d2=d2, bx=bx + 1, w=bx + 5,
        )
    tbuoy = None
    if temp is not None:
        (tw, tstart, tacc, temp_out, tempnew_out,
         t_gdir, t_alpha2, t_alpha4, t_dis) = temp
        # face-averaged T on the (bx+1) momentum planes
        # [start-1, start+bx-1] (shared with the x-flux below)
        if t_gdir == 0:
            tavg0 = 0.5 * (tw[: bx + 1] + tw[1 : bx + 2])
        else:
            twc = tw[: bx + 1]
            tavg0 = 0.5 * (twc + _rp(twc, t_gdir))
        tbuoy = t_alpha2 * tavg0
    d = None
    for a in range(3):
        f = _convdiff_window(at, visc, dx, a)
        if smf is not None:
            f = f + smf[a]
        if tbuoy is not None and a == temp[5]:
            f = f + tbuoy
        if bf is not None:
            f = f + bf(a)
        if emit_k:
            k_out[a, :, :, :] = f[1:].astype(k_out.dtype)
        if with_usnew:
            if usnew_base is not None:
                base0 = usnew_base(a)
            elif acc is not None:
                base0 = acc(a)
            else:
                base0 = base(a)
            usnew_out[a, :, :, :] = (
                base0[1:] + coeffs_smem[m + 1] * f[1:]
            ).astype(usnew_out.dtype)
        # tableau accumulation: ustart + sum_j c_j k_j + c_new f
        if acc is not None:
            utw = acc(a)
        else:
            utw = base(a)
            for q in range(1, m + 1):
                utw = utw + coeffs_smem[q - 1] * kstream(q, a)
        utw = utw + coeffs_smem[m] * f
        ut_c = utw[1:]
        ut_out[a, :, :, :] = ut_c.astype(ut_out.dtype)
        if a == 0:
            d = (utw[1:] - utw[:-1]) / dx[0]
        else:
            d += (ut_c - _rm(ut_c, a)) / dx[a]
    d = d * vol
    if temp is not None:
        # temperature RHS on the bx center planes [start, start+bx)
        # (roll-twin: fastpath.temp_rhs; reference
        # src/operators.jl:711-808)
        Tc = tw[1 : bx + 1]
        # x-axis: face fluxes at [start-1, start+bx-1] (tavg along x is
        # exactly the gdir==0 buoyancy average)
        if t_gdir == 0:
            tavg_x = tavg0
        else:
            tavg_x = 0.5 * (tw[: bx + 1] + tw[1 : bx + 2])
        uT_x = at(0, 1, -1) * tavg_x
        dT_x = (tw[1 : bx + 2] - tw[: bx + 1]) / dx[0]
        kt = (
            -(uT_x[1:] - uT_x[:-1])
            + t_alpha4 * (dT_x[1:] - dT_x[:-1])
        ) / dx[0]
        for b in (1, 2):
            ub = at(b, 2, -1)  # u_b at [start, start+bx)
            uT2 = ub * 0.5 * (Tc + _rp(Tc, b))
            dT2 = (_rp(Tc, b) - Tc) / dx[b]
            kt += (
                -(uT2 - _rm(uT2, b)) + t_alpha4 * (dT2 - _rm(dT2, b))
            ) / dx[b]
        if t_dis is not None:
            # dissipation: dis * sum_b (u_b diff_b)|_I avg'd to centers,
            # diff_b = visc * Laplacian(u_b) re-derived from the window
            w0 = at(0, 0, 0)  # [start-2, start+bx], bx+3 planes
            w0c = w0[1:-1]
            lap0 = (w0[2:] - 2.0 * w0c + w0[:-2]) / (dx[0] * dx[0])
            for cax in (1, 2):
                lap0 += (
                    _rp(w0c, cax) - 2.0 * w0c + _rm(w0c, cax)
                ) / (dx[cax] * dx[cax])
            g0 = at(0, 1, -1) * (visc * lap0)
            dacc = 0.5 * (g0[1:] + g0[:-1])
            for b in (1, 2):
                wb = at(b, 1, 0)  # [start-1, start+bx], bx+2 planes
                wbc = wb[1:-1]
                lapb = (wb[2:] - 2.0 * wbc + wb[:-2]) / (dx[0] * dx[0])
                for cax in (1, 2):
                    lapb += (
                        _rp(wbc, cax) - 2.0 * wbc + _rm(wbc, cax)
                    ) / (dx[cax] * dx[cax])
                gb = at(b, 2, -1) * (visc * lapb)
                dacc += 0.5 * (gb + _rm(gb, b))
            kt += t_dis * dacc
        tb = tstart if tstart is not None else Tc
        temp_out[:, :, :] = tb + coeffs_smem[m] * kt
        if tempnew_out is not None:
            tb2 = tacc if tacc is not None else tb
            tempnew_out[:, :, :] = tb2 + coeffs_smem[m + 1] * kt
    # z/y forward transform, per plane (Poisson pass A fused in)
    vinvy_s = _prep_mat(vinvy_hbm, manualhigh)
    vinvzT_s = _prep_mat(vinvzT_hbm, manualhigh)
    for p in range(bx):
        t = _mm_h(d[p], vinvzT_s, manualhigh)
        divhat_out[p, :, :] = _mm_h_left(vinvy_s, t, manualhigh)


def _msd_hat_stream_kernel(
    coeffs_smem, u_hbm, *args,
    visc, dx, vol, bx, n, manualhigh, m, emit_k=True, with_usnew=False,
    with_bf=False,
):
    """`_msd_hat_kernel` with SEQUENTIAL stream accumulation.

    The full-prefetch kernel holds every tableau stream window in VMEM
    at once (6*nst*(bx+1) scratch planes), which forces bx=1 on deep
    tableau rows at 512^3 (~35% step-time regression vs LMWray3,
    BASELINE.md "Round-2 late").  Here the streams ping-pong through ONE
    double-buffered window and fold into a persistent accumulator as
    they land, so the scratch cost is FLAT in the stream count: the
    per-stream axpy (VPU) overlaps the next stream's DMA, total HBM
    traffic is unchanged, and deep stages keep bx>=2 at 512^3 (bx=8 at
    256^3).  A body-force stream rides last and stays resident in its
    landing buffer (it joins the momentum eval, not the base)."""
    nst = m + 1 + with_bf
    streams = args[:nst]
    vinvy_hbm = args[nst]
    vinvzT_hbm = args[nst + 1]
    outs = list(args[nst + 2 : nst + 2 + emit_k + 2 + with_usnew])
    rest = args[nst + 2 + emit_k + 2 + with_usnew :]
    k_out = outs.pop(0) if emit_k else None
    ut_out = outs.pop(0)
    divhat_out = outs.pop(0)
    usnew_out = outs.pop(0) if with_usnew else None
    su, sb, sacc, sems = rest

    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    def ucopies(j, s):
        start = j * bx
        lo1 = (start - 1 + n) % n
        lo2 = (start - 2 + n) % n
        hi = (start + bx) % n
        return [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start, bx)],
                su.at[s, :, pl.ds(2, bx)],
                sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(lo1, 1)],
                su.at[s, :, pl.ds(1, 1)],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(lo2, 1)],
                su.at[s, :, pl.ds(0, 1)],
                sems.at[s, 2],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(hi, 1)],
                su.at[s, :, pl.ds(bx + 2, 1)],
                sems.at[s, 3],
            ),
        ]

    def scp(j, q, p):
        """Stream q's (bx+1)-plane window of slab j into ping-pong
        buffer p (sem pair rides the buffer)."""
        start = j * bx
        lo1 = (start - 1 + n) % n
        return [
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(start, bx)],
                sb.at[p, :, pl.ds(1, bx)],
                sems.at[p, 4],
            ),
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(lo1, 1)],
                sb.at[p, :, pl.ds(0, 1)],
                sems.at[p, 5],
            ),
        ]

    @pl.when(i == 0)
    def _():
        for cp in ucopies(0, 0):
            cp.start()
        for cp in scp(0, 0, 0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in ucopies(i + 1, (i + 1) % 2):
            cp.start()

    for cp in ucopies(i, slot):
        cp.wait()

    base_par = (i * nst) % 2
    for q in range(nst):
        p = (base_par + q) % 2
        pn = (base_par + q + 1) % 2
        # issue the NEXT stream's DMAs before folding this one, so the
        # axpy compute hides the transfer
        if q + 1 < nst:
            for cp in scp(i, q + 1, pn):
                cp.start()
        else:

            @pl.when(i + 1 < nslab)
            def _():
                for cp in scp(i + 1, 0, pn):
                    cp.start()

        for cp in scp(i, q, p):
            cp.wait()
        if q == 0:
            for a in range(3):
                sacc[a] = sb[p, a]
        elif q <= m:
            for a in range(3):
                sacc[a] = sacc[a] + coeffs_smem[q - 1] * sb[p, a]
        # else: the body-force stream stays resident in buffer p — the
        # next DMA (slab i+1's stream 0) targets the OTHER buffer and
        # the tail below runs before any further issue touches p

    p_bf = (base_par + nst - 1) % 2

    def at(a, lo_sh, hi_off):
        return su[slot, a, lo_sh : bx + 3 + hi_off, :, :]

    _stage_tail(
        at, coeffs_smem,
        k_out, ut_out, divhat_out, usnew_out,
        vinvy_hbm, vinvzT_hbm,
        visc=visc, dx=dx, vol=vol, bx=bx, m=m, manualhigh=manualhigh,
        emit_k=emit_k, with_usnew=with_usnew,
        bf=(lambda a: sb[p_bf, a]) if with_bf else None,
        acc=(lambda a: sacc[a]),
    )


def momentum_stage_divhat_3d(
    u_int, streams, coeffs, visc, dxs, vinvy, vinvzT,
    *, precision="manualhigh", bx=None, interpret=False,
    emit_k=True, usnew_coeff=None, bodyforce=None, stream_accum=None,
    usnew_base=None, smag=None, temperature=None, compute_dtype=None,
):
    """Fused momentum + RK tableau accumulation + divergence +
    z/y-forward eigen-transform (one HBM pass):

        k   = convdiff(u)
        ut  = streams[0] + sum_j coeffs[j-1]*streams[j] + coeffs[-1]*k
        divhat[p] = Vinv_y @ (vol*div(ut)[p] @ Vinv_z^T)

    ``streams``: (ustart, k_1, ..., k_m) interior-layout fields (the
    nonzero-tableau-entry streams of the stage); ``coeffs``: m+1 traced
    scalars (one per k-stream, then the new k's coefficient).  Returns
    ``(k, ut, divhat)``; with ``emit_k=False`` the k output is dropped
    (``(ut, divhat)``) — the final stage's k is never read; with
    ``usnew_coeff`` an extra output ``ustart + usnew_coeff*k`` is
    appended (LMWray3's accumulator update fused in).  Combined with
    `poisson passB` and `pressure_correct_qhat_3d` the entire pressure
    projection costs a single standalone HBM pass (reference flow:
    momentum! + tableau axpy sweeps + psolver,
    step_explicit_runge_kutta.jl:36-50).

    ``stream_accum``: fold tableau streams sequentially through one
    ping-pong buffer (`_msd_hat_stream_kernel`) instead of prefetching
    all of them — VMEM flat in the stream count, so deep tableau rows
    keep a deep slab (bx) at 512^3.  Default (None): auto — streaming
    whenever it allows a deeper slab than full prefetch.

    ``usnew_base``: optional field for the usnew output's base (the RK
    b-row accumulator: usnew = usnew_base + usnew_coeff*k instead of
    streams[0] + ...), riding as one more DMA stream.  When
    ``streams == (u_int,)`` (stage 0: ustart IS u) the redundant stream
    DMA is elided and the base is read from the u window.

    ``smag``: optional ``(theta, d2)`` — fuse the natural-form
    Smagorinsky force into the kernel (widened u window, force computed
    in `_stage_tail`): the separate force kernel pass and its HBM
    round-trip disappear.

    ``temperature``: optional ``(temp, tempstart, tempacc, gdir,
    alpha2, alpha4, dis)`` — Boussinesq temperature rides the SAME
    kernel pass (reference evaluates the temperature RHS inside the hot
    stage loop, src/time_steppers/step_explicit_runge_kutta.jl:20-28,
    src/operators.jl:711-808, 916-931): the buoyancy force
    ``alpha2*avg_gdir(temp)`` joins the momentum eval, and the
    temperature convection-diffusion (+ ``dis``-coefficient
    dissipation, recomputed from the in-VMEM u window) advances with
    the stage's OWN tableau coefficients.  ``temp`` is the stage's
    temperature (the RHS input); ``tempstart`` the tableau base
    (None: tempstart IS temp — stage 0, stream elided); ``tempacc`` an
    optional separate b-row accumulator base (temp mirror of
    ``usnew_base``).  Appends outputs ``temp_next = tempstart +
    coeffs[-1]*kt`` and — iff ``usnew_coeff`` — ``tempnew =
    (tempacc or tempstart) + usnew_coeff*kt``."""
    D, n, ny, nz = u_int.shape
    assert D == 3 and n == ny == nz
    cdtype = u_int.dtype if compute_dtype is None else compute_dtype
    streams = tuple(streams)
    coeffs = tuple(coeffs)
    m = len(streams) - 1
    assert len(coeffs) == m + 1
    with_bf = bodyforce is not None
    with_accbase = usnew_base is not None
    with_smag = smag is not None
    assert not (with_accbase and usnew_coeff is None)
    u_is_stream0 = m == 0 and streams[0] is u_int
    nst = m + 1 + with_bf + with_accbase
    dma_streams = () if u_is_stream0 else streams
    if with_bf:
        dma_streams = dma_streams + (bodyforce,)
    if with_accbase:
        dma_streams = dma_streams + (usnew_base,)
    # all DMA streams share one scratch — coerce stragglers (the steady
    # body force under bf16 stream storage; hoisted as loop-invariant)
    dma_streams = tuple(st.astype(u_int.dtype) for st in dma_streams)
    n_dma = len(dma_streams)
    with_temp = temperature is not None
    with_usnew = usnew_coeff is not None
    if with_temp:
        (t_field, t_start, t_acc, t_gdir,
         t_alpha2, t_alpha4, t_dis) = temperature
        t_elide = t_start is None
        with_tacc = t_acc is not None
        assert not (with_tacc and t_elide)
        assert not (with_tacc and not with_usnew)
        assert m == 0, "fused temp supports single-stream stages only"
        nts = (0 if t_elide else 1) + with_tacc
        t_hbm_args = (t_field,) + tuple(
            s for s in (t_start, t_acc) if s is not None
        )
        tparams = (int(t_gdir), float(t_alpha2), float(t_alpha4),
                   None if t_dis is None else float(t_dis),
                   t_elide, with_tacc, with_usnew)
    else:
        nts = 0
        t_hbm_args = ()
        tparams = None
    vol = float(np.prod(dxs))
    # streaming accumulation keeps VMEM flat in the stream count: pick
    # it whenever that buys a deeper slab (deep tableau rows at 512^3;
    # the ring-carry full-prefetch kernel is otherwise strictly better —
    # it never re-reads ghost planes)
    # temp scratch (2*(b+2) window + 2*nts*b streams) + outputs and RHS
    # temporaries (~10b), per-b plane count
    t_planes = (12 + 2 * nts) if with_temp else 0
    if with_smag:
        # widened window + the smag body's strain/stress temporaries
        # (~13 single-buffered windows of bx+5 planes)
        bx_full = _pick_bx(
            n, lambda b: 6 * (b + 5) + 6 * n_dma * (b + 1) + 14 * b
            + 20 * (b + 5) + t_planes * b
        )
    else:
        bx_full = _pick_bx(
            n, lambda b: 6 * (b + 3) + 6 * n_dma * (b + 1) + 14 * b
            + t_planes * b
        )
    bx_stream = _pick_bx(n, lambda b: 6 * (b + 3) + 9 * (b + 1) + 14 * b)
    if stream_accum is None:
        stream_accum = (
            nst >= 2
            and bx_stream > bx_full
            and cdtype == u_int.dtype
            and not (with_accbase or u_is_stream0 or with_smag or with_temp)
        )
    assert not (stream_accum and cdtype != u_int.dtype)
    if stream_accum and with_usnew:
        assert m == 0, "streaming usnew needs acc == ustart (m == 0)"
    assert not (stream_accum and (with_accbase or u_is_stream0 or with_smag
                                  or with_temp))
    if bx is None:
        bx = bx_stream if stream_accum else bx_full
    while n % bx != 0:
        bx //= 2
    if with_smag and bx == n:  # the wide window needs >= 2 slabs
        bx //= 2
    kw = (
        dict(with_bf=with_bf)
        if stream_accum
        else dict(
            with_bf=with_bf,
            with_accbase=with_accbase,
            u_is_stream0=u_is_stream0,
            smag_d2=(float(smag[1]) if with_smag else None),
            tparams=tparams,
        )
    )
    kernel = functools.partial(
        _msd_hat_stream_kernel if stream_accum else _msd_hat_kernel,
        visc=float(visc),
        dx=tuple(map(float, dxs)),
        vol=vol,
        bx=bx,
        n=n,
        manualhigh=(precision == "manualhigh"),
        m=m,
        emit_k=emit_k,
        with_usnew=with_usnew,
        **kw,
    )
    all_coeffs = (
        list(coeffs)
        + ([usnew_coeff] if with_usnew else [])
        + ([smag[0]] if with_smag else [])
    )
    coeff_arr = jnp.stack(
        [jnp.asarray(c, cdtype) for c in all_coeffs]
    ).reshape(len(all_coeffs))
    vec_spec = pl.BlockSpec(
        (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    sca_spec = pl.BlockSpec(
        (bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_shape = jax.ShapeDtypeStruct((3, n, n, n), u_int.dtype)
    sca_shape = jax.ShapeDtypeStruct((n, n, n), cdtype)
    n_tout = (1 + with_usnew) if with_temp else 0
    out_specs = (
        ([vec_spec] if emit_k else [])
        + [vec_spec, sca_spec]
        + ([vec_spec] if with_usnew else [])
        + [sca_spec] * n_tout
    )
    out_shape = (
        ([vec_shape] if emit_k else [])
        + [vec_shape, sca_shape]
        + ([vec_shape] if with_usnew else [])
        + [sca_shape] * n_tout
    )
    if stream_accum:
        scratch = [
            pltpu.VMEM((2, 3, bx + 3, n, n), u_int.dtype),
            pltpu.VMEM((2, 3, bx + 1, n, n), u_int.dtype),
            pltpu.VMEM((3, bx + 1, n, n), u_int.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ]
    else:
        W = bx + (5 if with_smag else 3)
        scratch = [pltpu.VMEM((2, 3, W, n, n), u_int.dtype)]
        if n_dma:
            scratch.append(pltpu.VMEM((2, n_dma, 3, bx + 1, n, n),
                                      u_int.dtype))
        if with_temp:
            scratch.append(pltpu.VMEM((2, bx + 2, n, n), cdtype))
            if nts:
                scratch.append(pltpu.VMEM((2, nts, bx, n, n),
                                          cdtype))
        scratch.append(pltpu.SemaphoreType.DMA(
            (2, 3 + 2 * n_dma + (3 + nts if with_temp else 0))
        ))
    return pl.pallas_call(
        kernel,
        grid=(n // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)]
        * (n_dma + 1 + len(t_hbm_args))
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(coeff_arr, u_int, *dma_streams, *t_hbm_args, vinvy, vinvzT)


def _seg_window_copy(main, lo, hi, dst, sems, sem0, j, nslab, *, bx, nlo, nhi,
                     lx):
    """Start/wait helpers for a segmented x-window DMA: the window
    [j*bx - nlo, j*bx + bx + nhi) of a shard-local array is assembled
    from up to three sources — `lo` (the left neighbour's ghost planes,
    used only by the FIRST block), `main`, and `hi` (right neighbour's,
    LAST block only).  Every branch signals the same semaphores with the
    same byte counts, so waits are branch-free.

    `main`/`lo`/`hi` are HBM refs whose x dim is the SECOND-to-leading
    (component-major (3, lx, ny, nz)) or leading ((lx, ny, nz)) — pass
    accessors `at_x(ref, start, size)` via closure instead?  Keeping it
    simple: refs here are pre-bound `.at`-style callables."""
    start = j * bx
    pltpu.make_async_copy(main(start, bx), dst(nlo, bx), sems.at[sem0]).start()
    if nlo:
        lo_sem = sems.at[sem0 + 1]

        @pl.when(j == 0)
        def _():
            pltpu.make_async_copy(lo(0, nlo), dst(0, nlo), lo_sem).start()

        @pl.when(j > 0)
        def _():
            pltpu.make_async_copy(
                main(jnp.maximum(start - nlo, 0), nlo), dst(0, nlo), lo_sem
            ).start()

    if nhi:
        hi_sem = sems.at[sem0 + 2 if nlo else sem0 + 1]

        @pl.when(j == nslab - 1)
        def _():
            pltpu.make_async_copy(
                hi(0, nhi), dst(nlo + bx, nhi), hi_sem
            ).start()

        @pl.when(j < nslab - 1)
        def _():
            pltpu.make_async_copy(
                main(jnp.minimum(start + bx, lx - nhi), nhi),
                dst(nlo + bx, nhi), hi_sem,
            ).start()


def _msd_hat_halo_kernel(
    coeffs_smem, u_hbm, u_lo, u_hi, *args,
    visc, dx, vol, bx, lx, manualhigh, m, emit_k=True, with_usnew=False,
    with_bf=False, with_accbase=False, u_is_stream0=False, smag_d2=None,
):
    """Per-shard `_msd_hat_kernel`: identical stage tail and ring-carry
    slab pipeline, but the x-slab shard's ghost planes arrive as
    SEPARATE small arrays (`u_lo`: the left ring neighbour's last ng_lo
    planes, `u_hi`: the right neighbour's first ng_hi; 1 lower plane per
    stream) DMA'd straight into the scratch window edges — the local
    fields are never concat-padded in HBM, so the halo step costs
    exactly the single-chip kernel's HBM traffic plus the ppermute of
    the boundary planes.  Only window 0 touches the lo arrays (carried
    thereafter); the hi array is read by the last window only.  Ghost
    widths (ng_lo, ng_hi) = (2, 1), widened to (3, 2) when the
    Smagorinsky force is fused (``smag_d2``)."""
    n_dma = (0 if u_is_stream0 else m + 1) + with_bf + with_accbase
    streams = args[:n_dma]       # [ustart, k_1..k_m][, bf][, accbase]
    streams_lo = args[n_dma : 2 * n_dma]  # their 1-plane lower ghosts
    vinvy_hbm = args[2 * n_dma]
    vinvzT_hbm = args[2 * n_dma + 1]
    outs = list(args[2 * n_dma + 2 : 2 * n_dma + 2 + emit_k + 2 + with_usnew])
    rest = args[2 * n_dma + 2 + emit_k + 2 + with_usnew :]
    k_out = outs.pop(0) if emit_k else None
    ut_out = outs.pop(0)
    divhat_out = outs.pop(0)
    usnew_out = outs.pop(0) if with_usnew else None
    if n_dma:
        su, sb, sems = rest
    else:
        su, sems = rest
        sb = None

    i = pl.program_id(0)
    nslab = lx // bx
    slot = i % 2
    with_smag = smag_d2 is not None
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    W = bx + ng

    def u_full(s):
        # window 0: the lo planes come from the left neighbour; the hi
        # planes are local, or the right neighbour's when this shard
        # has a single window (static)
        hi_src = (
            u_hi.at[:, pl.ds(0, ng_hi)]
            if nslab == 1
            else u_hbm.at[:, pl.ds(bx, ng_hi)]
        )
        return [
            pltpu.make_async_copy(
                u_lo.at[:, pl.ds(0, ng_lo)], su.at[s, :, pl.ds(0, ng_lo)],
                sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx)], su.at[s, :, pl.ds(ng_lo, bx)],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                hi_src, su.at[s, :, pl.ds(bx + ng_lo, ng_hi)],
                sems.at[s, 2],
            ),
        ]

    def u_part(j, s):
        # window j > 0: positions 0..ng-1 carried; DMA only new planes
        start = j * bx
        cps = []
        if bx > ng_hi:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start + ng_hi, bx - ng_hi)],
                su.at[s, :, pl.ds(ng, bx - ng_hi)], sems.at[s, 0],
            ))
        return cps

    def u_part_hi(j, s):
        # hi planes: local [start+bx, ng_hi), or the right neighbour's
        # first ng_hi for the last window (branches signal the same
        # sem/bytes)
        start = j * bx
        hi_sem = sems.at[s, 1]

        @pl.when(j == nslab - 1)
        def _():
            pltpu.make_async_copy(
                u_hi.at[:, pl.ds(0, ng_hi)],
                su.at[s, :, pl.ds(W - ng_hi, ng_hi)], hi_sem,
            ).start()

        @pl.when(j < nslab - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(jnp.minimum(start + bx, lx - ng_hi),
                                  ng_hi)],
                su.at[s, :, pl.ds(W - ng_hi, ng_hi)], hi_sem,
            ).start()

    def u_part_hi_wait(s):
        pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(0, ng_hi)],
            su.at[s, :, pl.ds(W - ng_hi, ng_hi)], sems.at[s, 1],
        ).wait()

    def s_full(s):
        cps = []
        for q in range(n_dma):
            cps.append(pltpu.make_async_copy(
                streams_lo[q].at[:, pl.ds(0, 1)],
                sb.at[s, q, :, pl.ds(0, 1)], sems.at[s, 4 + 2 * q],
            ))
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(0, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, 3 + 2 * q],
            ))
        return cps

    def s_part(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(start, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, 3 + 2 * q],
            )
            for q in range(n_dma)
        ]

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + s_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in u_part(i + 1, 1 - slot) + s_part(i + 1, 1 - slot):
            cp.start()
        u_part_hi(i + 1, 1 - slot)

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + s_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in u_part(i, slot) + s_part(i, slot):
            cp.wait()
        u_part_hi_wait(slot)

    # ring carry: seed window i+1's low planes from window i's buffer
    @pl.when(i + 1 < nslab)
    def _():
        su[1 - slot, :, 0:ng] = su[slot, :, bx : bx + ng]
        for q in range(n_dma):
            sb[1 - slot, q, :, 0:1] = sb[slot, q, :, bx : bx + 1]

    off = ng_lo - 2

    def at(a, lo_sh, hi_off):
        return su[slot, a, off + lo_sh : off + bx + 3 + hi_off, :, :]

    if u_is_stream0:
        base = lambda a: su[slot, a, off + 1 : off + bx + 2]  # noqa: E731
        idx_bf = 0
    else:
        base = lambda a: sb[slot, 0, a]  # noqa: E731
        idx_bf = m + 1
    idx_acc = idx_bf + with_bf

    _stage_tail(
        at, coeffs_smem,
        k_out, ut_out, divhat_out, usnew_out,
        vinvy_hbm, vinvzT_hbm,
        visc=visc, dx=dx, vol=vol, bx=bx, m=m, manualhigh=manualhigh,
        emit_k=emit_k, with_usnew=with_usnew,
        base=base,
        kstream=lambda q, a: sb[slot, q, a],
        bf=(lambda a: sb[slot, idx_bf, a]) if with_bf else None,
        usnew_base=(lambda a: sb[slot, idx_acc, a]) if with_accbase else None,
        smag=(
            (coeffs_smem[m + 1 + with_usnew], smag_d2,
             lambda a: su[slot, a, 0:W])
            if with_smag
            else None
        ),
    )


def momentum_stage_divhat_halo_3d(
    u_loc, u_lo, u_hi, streams, streams_lo, coeffs, visc, dxs, vinvy, vinvzT,
    *, precision="manualhigh", bx=None, interpret=False,
    emit_k=True, usnew_coeff=None, bodyforce=None, bodyforce_lo=None,
    usnew_base=None, smag=None,
):
    """`momentum_stage_divhat_3d` on an x-slab shard block with
    segmented halo DMAs.

    ``u_loc``: (3, lx, ny, nz) local block; ``u_lo`` (3, ng_lo, ny, nz)
    / ``u_hi`` (3, ng_hi, ny, nz): the ring neighbours' boundary planes
    (ppermute'd by `parallel/halo.py`; (ng_lo, ng_hi) = (2, 1), widened
    to (3, 2) when the Smagorinsky force is fused via ``smag``).
    ``streams``: each (3, lx, ny, nz) with its 1-plane lower ghost in
    ``streams_lo``; ``bodyforce``/``bodyforce_lo`` likewise.  Outputs
    are exact local extent — no edge planes to discard and NO
    concat-padding in HBM.  On x-slab meshes ny == nz is the global
    cube extent (unsharded), so the z/y forward transform is
    shard-local and exact.

    2-D pencil meshes: the block's y extent is a y-halo'd local slice
    (ly + 8 != nz) and ``vinvy`` is RECTANGULAR (ny_modes, ny_blk) — the
    shard's column slice of the y eigenbasis with ZERO columns at the
    halo-pad rows, so the pad rows (whose periodic y-wrap is wrong)
    never reach the y transform and `divhat` holds this shard's PARTIAL
    contribution to all ny_modes y-modes (completed by a psum_scatter
    over the y mesh axis in `parallel/halo.py`)."""
    D, lx, ny, nz = u_loc.shape
    with_smag = smag is not None
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    ny_modes = vinvy.shape[0]
    assert vinvy.shape[1] == ny and vinvzT.shape == (nz, nz), (
        vinvy.shape, vinvzT.shape, (ny, nz))
    assert D == 3 and lx >= 2 and lx % 2 == 0
    assert u_lo.shape == (3, ng_lo, ny, nz), (u_lo.shape, ng_lo)
    assert u_hi.shape == (3, ng_hi, ny, nz), (u_hi.shape, ng_hi)
    streams = tuple(streams)
    streams_lo = tuple(streams_lo)
    coeffs = tuple(coeffs)
    m = len(streams) - 1
    assert len(coeffs) == m + 1 and len(streams_lo) == m + 1
    for st in streams:
        assert st.shape == (3, lx, ny, nz), (st.shape, lx)
    with_bf = bodyforce is not None
    with_accbase = usnew_base is not None
    assert not (with_accbase and usnew_coeff is None)
    u_is_stream0 = m == 0 and streams[0] is u_loc
    if u_is_stream0:
        streams, streams_lo = (), ()
    if with_bf:
        streams = streams + (bodyforce,)
        streams_lo = streams_lo + (bodyforce_lo,)
    if with_accbase:
        # the accbase window's lower ghost plane is never read (usnew is
        # elementwise on the output planes) — feed its own first plane
        # so no extra halo exchange is needed
        streams = streams + (usnew_base,)
        streams_lo = streams_lo + (
            jax.lax.slice_in_dim(usnew_base, 0, 1, axis=1),
        )
    n_dma = len(streams)
    vol = float(np.prod(dxs))
    if bx is None:
        plane = max(ny, ny_modes) * nz
        if with_smag:
            bx = _pick_bx(
                lx, lambda b: 6 * (b + 5) + 6 * n_dma * (b + 1) + 14 * b
                + 20 * (b + 5), plane)
        else:
            bx = _pick_bx(
                lx, lambda b: 6 * (b + 3) + 6 * n_dma * (b + 1) + 14 * b,
                plane)
    while lx % bx != 0:
        bx //= 2
    # the partial window reads main planes [start + bx, ng_hi)
    bx = max(bx, 2)
    with_usnew = usnew_coeff is not None
    kernel = functools.partial(
        _msd_hat_halo_kernel,
        visc=float(visc),
        dx=tuple(map(float, dxs)),
        vol=vol,
        bx=bx,
        lx=lx,
        manualhigh=(precision == "manualhigh"),
        m=m,
        emit_k=emit_k,
        with_usnew=with_usnew,
        with_bf=with_bf,
        with_accbase=with_accbase,
        u_is_stream0=u_is_stream0,
        smag_d2=(float(smag[1]) if with_smag else None),
    )
    all_coeffs = (
        list(coeffs)
        + ([usnew_coeff] if with_usnew else [])
        + ([smag[0]] if with_smag else [])
    )
    coeff_arr = jnp.stack(
        [jnp.asarray(c, u_loc.dtype) for c in all_coeffs]
    ).reshape(len(all_coeffs))
    vec_spec = pl.BlockSpec(
        (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    dh_spec = pl.BlockSpec(
        (bx, ny_modes, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_shape = jax.ShapeDtypeStruct((3, lx, ny, nz), u_loc.dtype)
    out_specs = (
        ([vec_spec] if emit_k else [])
        + [vec_spec, dh_spec]
        + ([vec_spec] if with_usnew else [])
    )
    out_shape = (
        ([vec_shape] if emit_k else [])
        + [vec_shape, jax.ShapeDtypeStruct((lx, ny_modes, nz), u_loc.dtype)]
        + ([vec_shape] if with_usnew else [])
    )
    scratch = [pltpu.VMEM((2, 3, bx + ng, ny, nz), u_loc.dtype)]
    if n_dma:
        scratch.append(pltpu.VMEM((2, n_dma, 3, bx + 1, ny, nz),
                                  u_loc.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3 + 2 * n_dma)))
    return pl.pallas_call(
        kernel,
        grid=(lx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (3 + 2 * n_dma)
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(coeff_arr, u_loc, u_lo, u_hi, *streams, *streams_lo, vinvy, vinvzT)


def _pc_qhat_halo_kernel(
    ut_hbm, qhat_hbm, qhat_hi, vy_hbm, vzT_hbm, u_out, su, sq, sems,
    *, dx, bx, lx, manualhigh,
):
    """Per-shard `_pc_qhat_kernel`: the 1 upper x-ghost plane of qhat
    (the neighbour's first plane, already in the z/y eigen-basis — the
    transform is per-x-plane so halo exchange commutes with it) arrives
    as a separate 1-plane array DMA'd into the scratch window edge
    (segmented copies, no concat-padding)."""
    i = pl.program_id(0)
    nslab = pl.num_programs(0)
    slot = i % 2

    def issue(j, s):
        start = j * bx
        pltpu.make_async_copy(
            ut_hbm.at[:, pl.ds(start, bx)], su.at[s], sems.at[s, 0]
        ).start()
        _seg_window_copy(
            lambda st, sz: qhat_hbm.at[pl.ds(st, sz)],
            None,
            lambda st, sz: qhat_hi.at[pl.ds(st, sz)],
            lambda off, sz: sq.at[s, pl.ds(off, sz)],
            sems.at[s], 1, j, nslab, bx=bx, nlo=0, nhi=1, lx=lx,
        )

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < nslab)
    def _():
        issue(i + 1, (i + 1) % 2)

    start = i * bx
    pltpu.make_async_copy(
        ut_hbm.at[:, pl.ds(start, bx)], su.at[slot], sems.at[slot, 0]
    ).wait()
    pltpu.make_async_copy(
        qhat_hbm.at[pl.ds(start, bx)], sq.at[slot, pl.ds(0, bx)],
        sems.at[slot, 1],
    ).wait()
    pltpu.make_async_copy(
        qhat_hbm.at[pl.ds(0, 1)], sq.at[slot, pl.ds(bx, 1)],
        sems.at[slot, 2],
    ).wait()

    vy_s = _prep_mat(vy_hbm, manualhigh)
    vzT_s = _prep_mat(vzT_hbm, manualhigh)
    qplanes = []
    for p in range(bx + 1):
        t = _mm_h_left(vy_s, sq[slot, p], manualhigh)
        qplanes.append(_mm_h(t, vzT_s, manualhigh))
    qw = jnp.stack(qplanes)  # (bx+1, ny, nz)

    qc = qw[:bx]
    for a in range(3):
        if a == 0:
            g = (qw[1:] - qw[:-1]) / dx[0]
        else:
            g = (_rp(qc, a) - qc) / dx[a]
        u_out[a, :, :, :] = su[slot, a] - g


def pressure_correct_qhat_halo_3d(
    ut_loc, qhat_loc, qhat_hi, dxs, vy, vzT, *, precision="manualhigh",
    bx=None, interpret=False,
):
    """`pressure_correct_qhat_3d` on an x-slab shard block: ``ut_loc``
    (3, lx, ny, nz) and ``qhat_loc`` (lx, ny, nz) unpadded;
    ``qhat_hi`` (1, ny, nz) is the right neighbour's first qhat plane.
    Output (3, lx, ny, nz)."""
    D, lx, ny, nz = ut_loc.shape
    assert D == 3 and ny == nz
    assert qhat_loc.shape == (lx, ny, nz)
    assert qhat_hi.shape == (1, ny, nz)
    if bx is None:
        bx = _pick_bx(lx, lambda b: 14 * b + 2, ny * nz)
    while lx % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _pc_qhat_halo_kernel,
        dx=tuple(map(float, dxs)),
        bx=bx,
        lx=lx,
        manualhigh=(precision == "manualhigh"),
    )
    return pl.pallas_call(
        kernel,
        grid=(lx // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, lx, ny, nz), ut_loc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx, ny, nz), ut_loc.dtype),
            pltpu.VMEM((2, bx + 1, ny, nz), ut_loc.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(ut_loc, qhat_loc, qhat_hi, vy, vzT)


def _smag_force_kernel(
    theta_smem, u_hbm, *args, dx, d2, bx, n, with_bf,
):
    """Fused natural-form Smagorinsky force, one HBM pass:
    strain -> eddy viscosity -> stress -> tensor divergence, all in VMEM
    on a (bx+4)-plane x-window (radius 3 from u: +1 strain, +1 viscosity
    average, +1 stress divergence).  Matches
    `eddyviscosity.smagorinsky_natural_interior` (the roll-graph twin) on
    uniform periodic interior fields; reference pipeline
    src/eddyviscosity.jl:48-156 as separate sweeps.

    ``with_bf``: a steady body-force field rides as one more DMA stream
    and is added to the output, so LES + body force cost the stage kernel
    only ONE extra stream."""
    if with_bf:
        bf_hbm = args[0]
        args = args[1:]
    out_ref, su, sbf, sems = args

    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2
    w = bx + 4

    # Ring-carry: window j > 0 re-uses its 4 low planes (positions 0..3
    # <-> globals start-2..start+1) from window j-1's buffer; only the
    # bx new planes are DMA'd.  Window 0 reads the full wrapped window.
    def u_full(s):
        cps = [
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(n - 2, 2)],
                su.at[s, :, pl.ds(0, 2)], sems.at[s, 0],
            )
        ]
        if nslab == 1:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx)],
                su.at[s, :, pl.ds(2, bx)], sems.at[s, 1],
            ))
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, 2)],
                su.at[s, :, pl.ds(bx + 2, 2)], sems.at[s, 2],
            ))
        else:
            # nslab >= 2 and the production lane gate keep bx + 2 <= n
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(0, bx + 2)],
                su.at[s, :, pl.ds(2, bx + 2)], sems.at[s, 1],
            ))
        return cps

    def u_part(j, s):
        start = j * bx
        cps = []
        if bx > 2:
            cps.append(pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(start + 2, bx - 2)],
                su.at[s, :, pl.ds(4, bx - 2)], sems.at[s, 0],
            ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start + bx) % n, 1)],
            su.at[s, :, pl.ds(bx + 2, 1)], sems.at[s, 1],
        ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start + bx + 1) % n, 1)],
            su.at[s, :, pl.ds(bx + 3, 1)], sems.at[s, 2],
        ))
        return cps

    def bf_cp(j, s):
        if not with_bf:
            return []
        return [pltpu.make_async_copy(
            bf_hbm.at[:, pl.ds(j * bx, bx)], sbf.at[s], sems.at[s, 3],
        )]

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + bf_cp(0, 0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in u_part(i + 1, 1 - slot) + bf_cp(i + 1, 1 - slot):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in u_full(0) + bf_cp(0, 0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in u_part(i, slot) + bf_cp(i, slot):
            cp.wait()

    @pl.when(i + 1 < nslab)
    def _():
        su[1 - slot, :, 0:4] = su[slot, :, bx : bx + 4]

    ux = su[slot, 0]  # (w, n, n), local l <-> global start - 2 + l
    uy = su[slot, 1]
    uz = su[slot, 2]
    th = theta_smem[0]
    cx, cy, cz = _smag_body(ux, uy, uz, th, dx=dx, d2=d2, bx=bx, w=w)
    if with_bf:
        cx = cx + sbf[slot, 0]
        cy = cy + sbf[slot, 1]
        cz = cz + sbf[slot, 2]
    out_ref[0, :, :, :] = cx
    out_ref[1, :, :, :] = cy
    out_ref[2, :, :, :] = cz


def _smag_body(ux, uy, uz, th, *, dx, d2, bx, w):
    """Shared Smagorinsky force body on a (w = bx+4)-plane x-window
    (local l <-> global start - 2 + l); returns the force components on
    the center bx planes."""
    # strain components (x-index conventions in the comments: [l] is the
    # natural staggered position's x-plane)
    sxx = (ux[1:] - ux[:-1]) / dx[0]  # [i] <-> S_xx[l=i+1]
    syy = (uy - _rm(uy, 1)) / dx[1]  # [l]
    szz = (uz - _rm(uz, 2)) / dx[2]  # [l]
    sxy = 0.5 * (
        (_rp(ux, 1) - ux)[: w - 1] / dx[1] + (uy[1:] - uy[:-1]) / dx[0]
    )  # [i] <-> S_xy[l=i]
    sxz = 0.5 * (
        (_rp(ux, 2) - ux)[: w - 1] / dx[2] + (uz[1:] - uz[:-1]) / dx[0]
    )  # [i] <-> S_xz[l=i]
    syz = 0.5 * ((_rp(uy, 2) - uy) / dx[2] + (_rp(uz, 1) - uz) / dx[1])  # [l]

    # eddy viscosity nu[j] <-> nu_t[l=j+1] (4-point average of the
    # squared off-diagonal strains, reference smagorinsky_viscosity!)
    sxy_my = _rm(sxy, 1)
    sxz_mz = _rm(sxz, 2)
    syz_c = syz[1 : w - 1]
    acc = 2.0 * (sxx[: w - 2] ** 2 + syy[1 : w - 1] ** 2 + szz[1 : w - 1] ** 2)
    acc += (
        sxy[1 : w - 1] ** 2
        + sxy[: w - 2] ** 2
        + sxy_my[1 : w - 1] ** 2
        + sxy_my[: w - 2] ** 2
    )
    acc += (
        sxz[1 : w - 1] ** 2
        + sxz[: w - 2] ** 2
        + sxz_mz[1 : w - 1] ** 2
        + sxz_mz[: w - 2] ** 2
    )
    acc += (
        syz_c**2
        + _rm(syz_c, 1) ** 2
        + _rm(syz_c, 2) ** 2
        + _rm(_rm(syz_c, 1), 2) ** 2
    )
    nu = (th * th * d2) * jnp.sqrt(acc)  # [j] <-> nu[l=j+1], shape w-2

    # stress (2 nu S; off-diagonal viscosity averaged to edges)
    sigxx = 2.0 * nu * sxx[: w - 2]  # [j] <-> sigma_xx[l=j+1]
    sigyy = 2.0 * nu * syy[1 : w - 1]
    sigzz = 2.0 * nu * szz[1 : w - 1]
    nu_py = _rp(nu, 1)
    nu_pz = _rp(nu, 2)
    sigxy = (
        0.5
        * (nu[: w - 3] + nu[1 : w - 2] + nu_py[: w - 3] + nu_py[1 : w - 2])
        * sxy[1 : w - 2]
    )  # [m] <-> sigma_xy[l=m+1], shape w-3
    sigxz = (
        0.5
        * (nu[: w - 3] + nu[1 : w - 2] + nu_pz[: w - 3] + nu_pz[1 : w - 2])
        * sxz[1 : w - 2]
    )
    sigyz = (
        0.5 * (nu + nu_py + nu_pz + _rp(nu_py, 2)) * syz[1 : w - 1]
    )  # [j] <-> sigma_yz[l=j+1]

    # tensor divergence on output planes o in [0, bx) (global start + o)
    cx = (sigxx[2 : bx + 2] - sigxx[1 : bx + 1]) / dx[0]
    cx += (sigxy - _rm(sigxy, 1))[1 : bx + 1] / dx[1]
    cx += (sigxz - _rm(sigxz, 2))[1 : bx + 1] / dx[2]
    cy = (sigxy[1 : bx + 1] - sigxy[:bx]) / dx[0]
    cy += (_rp(sigyy, 1) - sigyy)[1 : bx + 1] / dx[1]
    cy += (sigyz - _rm(sigyz, 2))[1 : bx + 1] / dx[2]
    cz = (sigxz[1 : bx + 1] - sigxz[:bx]) / dx[0]
    cz += (sigyz - _rm(sigyz, 1))[1 : bx + 1] / dx[1]
    cz += (_rp(sigzz, 2) - sigzz)[1 : bx + 1] / dx[2]
    return cx, cy, cz


def _smag_force_halo_kernel(
    theta_smem, u_hbm, u_lo, u_hi, *args, dx, d2, bx, lx, with_bf,
):
    """Per-shard `_smag_force_kernel`: the 2 x-ghost planes each side
    arrive as separate small arrays (ring-neighbour values) DMA'd into
    the scratch window edges (segmented copies, no concat-padding)."""
    if with_bf:
        bf_hbm = args[0]
        args = args[1:]
    out_ref, su, sbf, sems = args

    i = pl.program_id(0)
    nslab = pl.num_programs(0)
    slot = i % 2

    def issue(j, s):
        _seg_window_copy(
            lambda st, sz: u_hbm.at[:, pl.ds(st, sz)],
            lambda st, sz: u_lo.at[:, pl.ds(st, sz)],
            lambda st, sz: u_hi.at[:, pl.ds(st, sz)],
            lambda off, sz: su.at[s, :, pl.ds(off, sz)],
            sems.at[s], 0, j, nslab, bx=bx, nlo=2, nhi=2, lx=lx,
        )
        if with_bf:
            pltpu.make_async_copy(
                bf_hbm.at[:, pl.ds(j * bx, bx)], sbf.at[s], sems.at[s, 3]
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < nslab)
    def _():
        issue(i + 1, (i + 1) % 2)

    start = i * bx
    pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(start, bx)], su.at[slot, :, pl.ds(2, bx)],
        sems.at[slot, 0],
    ).wait()
    pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(0, 2)], su.at[slot, :, pl.ds(0, 2)],
        sems.at[slot, 1],
    ).wait()
    pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(0, 2)], su.at[slot, :, pl.ds(bx + 2, 2)],
        sems.at[slot, 2],
    ).wait()
    if with_bf:
        pltpu.make_async_copy(
            bf_hbm.at[:, pl.ds(start, bx)], sbf.at[slot], sems.at[slot, 3]
        ).wait()

    cx, cy, cz = _smag_body(
        su[slot, 0], su[slot, 1], su[slot, 2], theta_smem[0],
        dx=dx, d2=d2, bx=bx, w=bx + 4,
    )
    if with_bf:
        cx = cx + sbf[slot, 0]
        cy = cy + sbf[slot, 1]
        cz = cz + sbf[slot, 2]
    out_ref[0, :, :, :] = cx
    out_ref[1, :, :, :] = cy
    out_ref[2, :, :, :] = cz


def smagorinsky_force_halo_3d(
    u_loc, u_lo, u_hi, theta, dxs, *, bodyforce=None, bx=None,
    interpret=False
):
    """`smagorinsky_force_3d` on an x-slab shard block: ``u_loc``
    (3, lx, ny, nz) unpadded; ``u_lo``/``u_hi`` (3, 2, ny, nz) are the
    ring neighbours' boundary planes; ``bodyforce`` (optional, steady)
    is the unpadded local block.  Output (3, lx, ny, nz)."""
    D, lx, ny, nz = u_loc.shape
    assert D == 3 and lx >= 2 and lx % 2 == 0
    assert u_lo.shape == (3, 2, ny, nz) and u_hi.shape == (3, 2, ny, nz)
    d2 = float(sum(dx * dx for dx in dxs))
    with_bf = bodyforce is not None
    if bx is None:
        bx = _pick_bx(lx, lambda b: 50 * b + 150, ny * nz)
    while lx % bx != 0:
        bx //= 2
    bx = max(bx, 2)  # the lo/hi segments read 2 main planes
    kernel = functools.partial(
        _smag_force_halo_kernel,
        dx=tuple(map(float, dxs)),
        d2=d2,
        bx=bx,
        lx=lx,
        with_bf=with_bf,
    )
    theta_arr = jnp.reshape(theta, (1,)).astype(u_loc.dtype)
    args = [theta_arr, u_loc, u_lo, u_hi] + ([bodyforce] if with_bf else [])
    return pl.pallas_call(
        kernel,
        grid=(lx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (3 + with_bf),
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, lx, ny, nz), u_loc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 4, ny, nz), u_loc.dtype),
            pltpu.VMEM((2, 3, bx, ny, nz), u_loc.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def smagorinsky_force_3d(
    u_int, theta, dxs, *, bodyforce=None, bx=None, interpret=False
):
    """Natural-form Smagorinsky closure force on interior-layout
    periodic-uniform fields in ONE HBM pass (strain, eddy viscosity,
    stress and its divergence never materialize in HBM; the reference
    runs them as 4 separate kernel sweeps, src/eddyviscosity.jl:48-156).
    ``theta`` is a traced scalar; ``bodyforce`` (optional, steady) is
    added to the output so the downstream stage kernel sees LES + force
    as one stream."""
    D, nx, ny, nz = u_int.shape
    assert D == 3
    d2 = float(sum(dx * dx for dx in dxs))
    with_bf = bodyforce is not None
    if bx is None:
        bx = _pick_bx(nx, lambda b: 50 * b + 150, ny * nz)
    while nx % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _smag_force_kernel,
        dx=tuple(map(float, dxs)),
        d2=d2,
        bx=bx,
        n=nx,
        with_bf=with_bf,
    )
    theta_arr = jnp.reshape(theta, (1,)).astype(u_int.dtype)
    args = [theta_arr, u_int] + ([bodyforce] if with_bf else [])
    return pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 + with_bf),
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), u_int.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + 4, ny, nz), u_int.dtype),
            pltpu.VMEM((2, 3, bx, ny, nz), u_int.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _pcmsd_hat_kernel(
    coeffs_smem, utprev_hbm, qhat_hbm, *args,
    visc, dx, vol, bx, n, manualhigh, m, emit_k, with_usnew,
    with_bf=False, with_accbase=False, smag_d2=None,
    base_is_recon=False, emit_u=False, tparams=None,
):
    """Merged pressure-correction + next-stage momentum kernel.

    The previous stage's velocity u = ut_prev - grad(q) is reconstructed
    IN VMEM (q inverse-transformed from qhat in-kernel) and immediately
    consumed by the conv-diff stencil — u never round-trips HBM between
    interior RK stages.  Windows (ghost widths (ng_lo, ng_hi) = (2, 1),
    widened to (3, 2) when the Smagorinsky force is fused): ut_prev /
    reconstructed-u planes [start-ng_lo, start+bx+ng_hi-1], qhat one
    plane further up (the x-gradient needs q above u's window).

    Ring carry: the RECONSTRUCTED u window's top ng planes are carried
    in VMEM (``suw``) across slab windows, so for windows j > 0 only bx
    new ut_prev planes are DMA'd, bx new qhat planes transformed (the
    overlap's transformed q plane rides scratch ``sqt``), and bx new u
    planes reconstructed — HBM reads, transform MXU work, and
    reconstruction VPU work are all exactly 1x.  This removes the
    (bx+4)/bx recompute that made the merged kernel LOSE to the unmerged
    chain in round 2 (256^3 RK44 14.2 vs 13.3 ms/step)).

    ``base_is_recon``: the tableau base (streams[0]) IS the
    reconstructed velocity — no ustart stream is DMA'd (the step-
    boundary merge: the final correction of step s rides stage 0 of
    step s+1, so u never materializes in HBM between scan steps).
    ``emit_u`` appends the reconstructed u as an extra output (RK44's
    later stages read ustart from HBM; LMWray3's don't need it).
    ``tparams``: Boussinesq temperature riding the pass exactly as in
    `_msd_hat_kernel` — the temp RHS consumes the RECONSTRUCTED
    (corrected) velocity window, matching the unmerged chain's
    stage-input velocity."""
    n_dma = m + 1 - base_is_recon + with_bf + with_accbase
    streams = args[:n_dma]       # [ustart,] k_1..k_m [, bf][, accbase]
    with_temp = tparams is not None
    if with_temp:
        (t_gdir, t_alpha2, t_alpha4, t_dis,
         t_elide, with_tacc, with_tempnew) = tparams
        nts = (0 if t_elide else 1) + with_tacc
        t_hbm = args[n_dma]
        t_streams = args[n_dma + 1 : n_dma + 1 + nts]
        args = args[:n_dma] + args[n_dma + 1 + nts :]
    else:
        nts = 0
        with_tempnew = False
    vy_hbm = args[n_dma]
    vzT_hbm = args[n_dma + 1]
    vinvy_hbm = args[n_dma + 2]
    vinvzT_hbm = args[n_dma + 3]
    nout = emit_k + 2 + with_usnew + emit_u + with_temp + with_tempnew
    outs = list(args[n_dma + 4 : n_dma + 4 + nout])
    rest = args[n_dma + 4 + nout :]
    k_out = outs.pop(0) if emit_k else None
    ut_out = outs.pop(0)
    divhat_out = outs.pop(0)
    usnew_out = outs.pop(0) if with_usnew else None
    u_out = outs.pop(0) if emit_u else None
    temp_out = outs.pop(0) if with_temp else None
    tempnew_out = outs.pop(0) if with_tempnew else None
    rest = list(rest)
    su, suw, sq, sqt, sb = rest[:5]
    rest = rest[5:]
    st = rest.pop(0) if with_temp else None
    stb = rest.pop(0) if nts else None
    sems = rest.pop(0)

    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2
    with_smag = smag_d2 is not None
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    W = bx + ng

    # --- DMA plans (window layout: su/suw positions [0, W) <-> globals
    # [start-ng_lo, start+bx+ng_hi-1]; sq positions [0, W] one plane
    # further up; stream positions [0, bx] <-> [start-1, start+bx-1])
    def ut_full(s):
        return [
            pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(n - ng_lo, ng_lo)],
                su.at[s, :, pl.ds(0, ng_lo)], sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(0, bx + ng_hi)],
                su.at[s, :, pl.ds(ng_lo, bx + ng_hi)], sems.at[s, 1],
            ),
        ]

    def ut_part(j, s):
        start = j * bx
        cps = []
        if bx > ng_hi:
            cps.append(pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(start + ng_hi, bx - ng_hi)],
                su.at[s, :, pl.ds(ng, bx - ng_hi)], sems.at[s, 0],
            ))
        for t in range(ng_hi):
            cps.append(pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds((start + bx + t) % n, 1)],
                su.at[s, :, pl.ds(W - ng_hi + t, 1)], sems.at[s, 1 + t],
            ))
        return cps

    def q_full(s):
        return [
            pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(n - ng_lo, ng_lo)],
                sq.at[s, pl.ds(0, ng_lo)], sems.at[s, 3],
            ),
            pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(0, bx + ng_hi + 1)],
                sq.at[s, pl.ds(ng_lo, bx + ng_hi + 1)], sems.at[s, 4],
            ),
        ]

    def q_part(j, s):
        start = j * bx
        cps = []
        if bx > ng_hi + 1:
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(start + ng_hi + 1, bx - ng_hi - 1)],
                sq.at[s, pl.ds(ng + 1, bx - ng_hi - 1)], sems.at[s, 3],
            ))
        for t in range(ng_hi + 1):
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds((start + bx + t) % n, 1)],
                sq.at[s, pl.ds(W - ng_hi + t, 1)], sems.at[s, 4 + t],
            ))
        return cps

    s0 = 4 + ng_hi + 1

    def s_full(s):
        cps = []
        for q in range(n_dma):
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(0, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, s0 + 2 * q],
            ))
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(n - 1, 1)],
                sb.at[s, q, :, pl.ds(0, 1)], sems.at[s, s0 + 1 + 2 * q],
            ))
        return cps

    def s_part(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(start, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, s0 + 2 * q],
            )
            for q in range(n_dma)
        ]

    # temp window (ghosts (1, 1)): positions [0, bx+2) <-> globals
    # [start-1, start+bx]; temp streams: [0, bx) <-> [start, start+bx)
    # (the wrapper guarantees nslab >= 2, so only window 0's low ghost
    # wraps)
    t0 = s0 + 2 * n_dma

    def t_full(s):
        if not with_temp:
            return []
        cps = [
            pltpu.make_async_copy(
                t_hbm.at[pl.ds(n - 1, 1)], st.at[s, pl.ds(0, 1)],
                sems.at[s, t0],
            ),
            pltpu.make_async_copy(
                t_hbm.at[pl.ds(0, bx + 1)], st.at[s, pl.ds(1, bx + 1)],
                sems.at[s, t0 + 1],
            ),
        ]
        for q in range(nts):
            cps.append(pltpu.make_async_copy(
                t_streams[q].at[pl.ds(0, bx)], stb.at[s, q],
                sems.at[s, t0 + 2 + q],
            ))
        return cps

    def t_part(j, s):
        if not with_temp:
            return []
        start = j * bx
        cps = []
        if bx > 1:
            cps.append(pltpu.make_async_copy(
                t_hbm.at[pl.ds(start + 1, bx - 1)],
                st.at[s, pl.ds(2, bx - 1)], sems.at[s, t0],
            ))
        cps.append(pltpu.make_async_copy(
            t_hbm.at[pl.ds((start + bx) % n, 1)],
            st.at[s, pl.ds(bx + 1, 1)], sems.at[s, t0 + 1],
        ))
        for q in range(nts):
            cps.append(pltpu.make_async_copy(
                t_streams[q].at[pl.ds(start, bx)], stb.at[s, q],
                sems.at[s, t0 + 2 + q],
            ))
        return cps

    @pl.when(i == 0)
    def _():
        for cp in ut_full(0) + q_full(0) + s_full(0) + t_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in (ut_part(i + 1, 1 - slot) + q_part(i + 1, 1 - slot)
                   + s_part(i + 1, 1 - slot) + t_part(i + 1, 1 - slot)):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in ut_full(0) + q_full(0) + s_full(0) + t_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in ut_part(i, slot) + q_part(i, slot) + s_part(i, slot) \
                + t_part(i, slot):
            cp.wait()

    # --- reconstruction: u = ut_prev - grad(q) into suw[slot]
    vy_s = _prep_mat(vy_hbm, manualhigh)
    vzT_s = _prep_mat(vzT_hbm, manualhigh)

    def qtrans(p, s):
        t = _mm_h_left(vy_s, sq[s, p], manualhigh)
        return _mm_h(t, vzT_s, manualhigh)

    def recon(qlist, lo):
        """Store u planes for window positions [lo, W) from q planes
        qlist (qlist[r] pairs with u position lo+r and qlist[r+1] above
        it)."""
        w = W - lo
        qs = jnp.stack(qlist)  # (w+1, n, n)
        qc = qs[:w]
        suw[slot, 0, lo:W] = (
            su[slot, 0, lo:W] - (qs[1:] - qs[:-1]) / dx[0]
        )
        suw[slot, 1, lo:W] = (
            su[slot, 1, lo:W] - (_rp(qc, 1) - qc) / dx[1]
        )
        suw[slot, 2, lo:W] = (
            su[slot, 2, lo:W] - (_rp(qc, 2) - qc) / dx[2]
        )

    @pl.when(i == 0)
    def _():
        qlist = [qtrans(p, 0) for p in range(W + 1)]
        recon(qlist, 0)
        sqt[:, :] = qlist[W]

    @pl.when(i > 0)
    def _():
        # carried: u positions 0..ng-1; transformed q top plane in sqt
        qlist = [sqt[:, :]] + [qtrans(p, slot) for p in range(ng + 1, W + 1)]
        recon(qlist, ng)
        sqt[:, :] = qlist[bx]

    # ring carry for window i+1 (reconstruction above is complete)
    @pl.when(i + 1 < nslab)
    def _():
        suw[1 - slot, :, 0:ng] = suw[slot, :, bx : bx + ng]
        for q in range(n_dma):
            sb[1 - slot, q, :, 0:1] = sb[slot, q, :, bx : bx + 1]
        if with_temp:
            st[1 - slot, 0:2] = st[slot, bx : bx + 2]

    off = ng_lo - 2

    def at(a, lo_sh, hi_off):
        return suw[slot, a, off + lo_sh : off + bx + 3 + hi_off, :, :]

    idx_bf = m + 1 - base_is_recon
    idx_acc = idx_bf + with_bf
    if base_is_recon:
        # tableau base = the reconstructed u window ([start-1,
        # start+bx-1] <-> suw positions [ng_lo-1, ng_lo+bx-1])
        base_fn = lambda a: suw[slot, a, ng_lo - 1 : ng_lo + bx]  # noqa: E731
    else:
        base_fn = lambda a: sb[slot, 0, a]  # noqa: E731
    _stage_tail(
        at, coeffs_smem,
        k_out, ut_out, divhat_out, usnew_out,
        vinvy_hbm, vinvzT_hbm,
        visc=visc, dx=dx, vol=vol, bx=bx, m=m, manualhigh=manualhigh,
        emit_k=emit_k, with_usnew=with_usnew,
        base=base_fn,
        kstream=lambda q, a: sb[slot, q - base_is_recon, a],
        bf=(lambda a: sb[slot, idx_bf, a]) if with_bf else None,
        usnew_base=(lambda a: sb[slot, idx_acc, a]) if with_accbase else None,
        smag=(
            (coeffs_smem[m + 1 + with_usnew], smag_d2,
             lambda a: suw[slot, a, 0:W])
            if with_smag
            else None
        ),
        temp=(
            (st[slot],
             None if t_elide else stb[slot, 0],
             stb[slot, 0 if t_elide else 1] if with_tacc else None,
             temp_out, tempnew_out,
             t_gdir, t_alpha2, t_alpha4, t_dis)
            if with_temp
            else None
        ),
    )
    if emit_u:
        for a in range(3):
            u_out[a, :, :, :] = suw[slot, a, ng_lo : ng_lo + bx].astype(
                u_out.dtype
            )


def _pcmsd_planes(n_dma, with_smag, emit_u=False, nts_temp=None):
    """VMEM plane-count estimate for the merged kernel's `_pick_bx`.
    ``nts_temp``: None (no temperature) or the temp stream count — adds
    the temp window/stream scratch plus RHS temporaries."""
    nout = 3 + 1 + 3 + 3 * emit_u
    ng = 5 if with_smag else 3
    extra = 20 * (ng + 2) if with_smag else 0
    t_planes = 0 if nts_temp is None else 12 + 2 * nts_temp

    def planes(b):
        # the kernel allocates the stream scratch as
        # VMEM((2, max(n_dma, 1), 3, b+1, ...)) — a dummy buffer exists
        # even when n_dma == 0, so the estimate must match.
        return (
            12 * (b + ng) + 2 * (b + ng + 1) + 6 * max(n_dma, 1) * (b + 1)
            + 2 * nout * b + extra + t_planes * b
        )

    return planes


def pcmsd_profitable(n, n_dma, with_smag=False, with_temp=False):
    """Whether the merged pc+momentum kernel should be used: profitable
    only when its (larger) VMEM footprint still allows a slab of >= 4
    planes — at bx=1 the per-window DMA-issue overhead dominates
    (measured 512^3 RK44: 143 ms merged vs 96 ms unmerged; 256^3 at
    bx=8: 9.5 vs 11.3 ms)."""
    bx = _pick_bx(n, _pcmsd_planes(n_dma, with_smag,
                                   nts_temp=2 if with_temp else None))
    return min(bx, n // 2) >= 4


def pcmsd_hat_3d(
    ut_prev, qhat, streams, coeffs, visc, dxs, proj,
    *, precision="manualhigh", bx=None, interpret=False,
    emit_k=True, usnew_coeff=None, bodyforce=None, usnew_base=None,
    smag=None, emit_u=False, temperature=None,
):
    """Merged pressure-correction + momentum + stage + divergence, one
    HBM pass: reconstructs ``u = ut_prev - grad(q)`` in VMEM (q's
    z/y-inverse transform fused in), evaluates conv-diff on it, and runs
    the next stage's tableau accumulation / divergence / z/y-forward
    transform — the corrected velocity never touches HBM between
    interior RK stages.  ``proj`` is a `make_fused_projection` dict.
    Output layout matches `momentum_stage_divhat_3d`; ``bodyforce`` and
    ``usnew_base`` (the RK b-row accumulator) ride as extra DMA streams
    exactly as there.

    With the ring-carry reconstruction (see `_pcmsd_hat_kernel`) this IS
    the production interior-stage kernel: it saves the corrected
    velocity's HBM write+read per stage vs the unmerged
    pc_qhat -> msd_hat chain at identical MXU cost (round 2's merged
    form lost because it re-transformed (bx+4)/bx of q per slab).

    ``streams[0] is RECON``: the tableau base is the kernel's OWN
    reconstructed velocity (no ustart DMA) — the step-boundary merge:
    scan steps carry (ut, qhat) and the final correction of step s runs
    as stage 0 of step s+1, so u never round-trips HBM between steps.
    ``emit_u`` additionally writes the reconstructed u (RK44's later
    stages read it back as ustart; LMWray3's accumulator chain doesn't
    need it).

    ``temperature``: optional ``(temp, tempstart, tempacc, gdir,
    alpha2, alpha4, dis)`` — Boussinesq temperature riding the merged
    pass exactly as in `momentum_stage_divhat_3d`: the temp RHS and
    dissipation consume the in-VMEM RECONSTRUCTED velocity, appending
    ``temp_next`` (+ ``tempnew`` iff ``usnew_coeff``) outputs."""
    D, n, ny, nz = ut_prev.shape
    assert D == 3 and n == ny == nz
    streams = tuple(streams)
    coeffs = tuple(coeffs)
    m = len(streams) - 1
    assert len(coeffs) == m + 1
    with_bf = bodyforce is not None
    with_accbase = usnew_base is not None
    assert not (with_accbase and usnew_coeff is None)
    base_is_recon = streams[0] is RECON
    assert not (base_is_recon and m > 0), "RECON base allows no k streams"
    dma_streams = streams[1:] if base_is_recon else streams
    if with_bf:
        dma_streams = dma_streams + (bodyforce,)
    if with_accbase:
        dma_streams = dma_streams + (usnew_base,)
    # all DMA streams share one scratch buffer — coerce stragglers (the
    # steady body force when the hat carry stores streams in bf16; the
    # convert is loop-invariant so XLA hoists it out of the scan)
    dma_streams = tuple(st.astype(ut_prev.dtype) for st in dma_streams)
    n_dma = len(dma_streams)
    with_smag = smag is not None
    ng = 5 if with_smag else 3
    vol = float(np.prod(dxs))
    with_usnew = usnew_coeff is not None
    with_temp = temperature is not None
    if with_temp:
        (t_field, t_start, t_acc, t_gdir,
         t_alpha2, t_alpha4, t_dis) = temperature
        t_elide = t_start is None
        with_tacc = t_acc is not None
        assert not (with_tacc and t_elide)
        assert not (with_tacc and not with_usnew)
        assert m == 0, "fused temp supports single-stream stages only"
        nts = (0 if t_elide else 1) + with_tacc
        t_hbm_args = (t_field,) + tuple(
            s for s in (t_start, t_acc) if s is not None
        )
        tparams = (int(t_gdir), float(t_alpha2), float(t_alpha4),
                   None if t_dis is None else float(t_dis),
                   t_elide, with_tacc, with_usnew)
    else:
        nts = 0
        t_hbm_args = ()
        tparams = None
    if bx is None:
        bx = _pick_bx(n, _pcmsd_planes(
            n_dma, with_smag, emit_u,
            nts_temp=nts if with_temp else None,
        ))
    while n % bx != 0:
        bx //= 2
    if bx == n:  # ring-carry window layout needs >= 2 windows
        bx //= 2
    assert n >= bx + ng and n % bx == 0, (n, bx)
    kernel = functools.partial(
        _pcmsd_hat_kernel,
        visc=float(visc),
        dx=tuple(map(float, dxs)),
        vol=vol,
        bx=bx,
        n=n,
        manualhigh=(precision == "manualhigh"),
        m=m,
        emit_k=emit_k,
        with_usnew=with_usnew,
        with_bf=with_bf,
        with_accbase=with_accbase,
        smag_d2=(float(smag[1]) if with_smag else None),
        base_is_recon=base_is_recon,
        emit_u=emit_u,
        tparams=tparams,
    )
    # Mixed storage/compute dtypes (bf16 stream storage, VERDICT-r4
    # item 5): velocity-like arrays (ut_prev, tableau streams, and the
    # ut/usnew/u/k outputs) may be stored bf16 while qhat and all
    # in-kernel arithmetic stay at the compute dtype (qhat.dtype) — the
    # reconstruction upcasts, JAX type promotion keeps every
    # accumulation in f32, and the stage-tail stores cast back.
    cdtype = qhat.dtype
    all_coeffs = (
        list(coeffs)
        + ([usnew_coeff] if with_usnew else [])
        + ([smag[0]] if with_smag else [])
    )
    coeff_arr = jnp.stack(
        [jnp.asarray(c, cdtype) for c in all_coeffs]
    ).reshape(len(all_coeffs))
    vec_spec = pl.BlockSpec(
        (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    sca_spec = pl.BlockSpec(
        (bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_shape = jax.ShapeDtypeStruct((3, n, n, n), ut_prev.dtype)
    sca_shape = jax.ShapeDtypeStruct((n, n, n), cdtype)
    n_tout = (1 + with_usnew) if with_temp else 0
    out_specs = (
        ([vec_spec] if emit_k else [])
        + [vec_spec, sca_spec]
        + ([vec_spec] if with_usnew else [])
        + ([vec_spec] if emit_u else [])
        + [sca_spec] * n_tout
    )
    out_shape = (
        ([vec_shape] if emit_k else [])
        + [vec_shape, sca_shape]
        + ([vec_shape] if with_usnew else [])
        + ([vec_shape] if emit_u else [])
        + [sca_shape] * n_tout
    )
    scratch = [
        pltpu.VMEM((2, 3, bx + ng, n, n), ut_prev.dtype),   # ut window
        pltpu.VMEM((2, 3, bx + ng, n, n), cdtype),          # recon u
        pltpu.VMEM((2, bx + ng + 1, n, n), cdtype),         # qhat window
        pltpu.VMEM((n, n), cdtype),                         # carried q
        pltpu.VMEM((2, max(n_dma, 1), 3, bx + 1, n, n), ut_prev.dtype),
    ]
    if with_temp:
        scratch.append(pltpu.VMEM((2, bx + 2, n, n), cdtype))
        if nts:
            scratch.append(pltpu.VMEM((2, nts, bx, n, n), cdtype))
    scratch.append(pltpu.SemaphoreType.DMA(
        (2, 4 + ng + 2 * max(n_dma, 1) + (2 + nts if with_temp else 0))
    ))
    return pl.pallas_call(
        kernel,
        grid=(n // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)]
        * (n_dma + 2 + len(t_hbm_args))
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        # 120 MB: at 512^3 even bx=1 sits at ~110.1 MB (the ring-carry
        # makes HBM traffic bx-independent, so the shallow slab costs
        # only DMA-issue overhead, not bandwidth)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        coeff_arr, ut_prev, qhat, *dma_streams, *t_hbm_args,
        proj["V"], proj["VT"], proj["Vinv"], proj["VinvT"],
    )


def _pcmsd_hat_halo_kernel(
    coeffs_smem, utprev_hbm, ut_lo, ut_hi, qhat_hbm, qhat_lo, qhat_hi,
    *args,
    visc, dx, vol, bx, lx, manualhigh, m, emit_k, with_usnew,
    with_bf=False, with_accbase=False, smag_d2=None,
    base_is_recon=False, emit_u=False,
):
    """Per-shard `_pcmsd_hat_kernel` (merged pressure-correction +
    next-stage momentum): identical ring-carried reconstruction and
    stage tail, but the x-slab shard's ghost planes arrive as SEPARATE
    small arrays ppermute'd by `parallel/halo.py` — ``ut_lo``/``ut_hi``
    the neighbours' (ng_lo, ng_hi) boundary planes of the uncorrected
    velocity, ``qhat_lo``/``qhat_hi`` the (ng_lo, ng_hi+1) boundary
    planes of the eigen-basis pressure (the z/y transform is per-x-plane
    so halo exchange commutes with it), and each tableau stream's 1
    lower plane in ``streams_lo``.  The corrected velocity u never
    round-trips HBM between interior RK stages on the shard.

    ``base_is_recon``/``emit_u``: as in `_pcmsd_hat_kernel` — the
    step-boundary merge's RECON tableau base and reconstructed-u
    output, for a future (ut, qhat) hat carry across shards."""
    n_dma = m + 1 - base_is_recon + with_bf + with_accbase
    streams = args[:n_dma]       # [ustart,] k_1..k_m [, bf][, accbase]
    streams_lo = args[n_dma : 2 * n_dma]
    vy_hbm = args[2 * n_dma]
    vzT_hbm = args[2 * n_dma + 1]
    vinvy_hbm = args[2 * n_dma + 2]
    vinvzT_hbm = args[2 * n_dma + 3]
    o0 = 2 * n_dma + 4
    nout = emit_k + 2 + with_usnew + emit_u
    outs = list(args[o0 : o0 + nout])
    rest = args[o0 + nout :]
    k_out = outs.pop(0) if emit_k else None
    ut_out = outs.pop(0)
    divhat_out = outs.pop(0)
    usnew_out = outs.pop(0) if with_usnew else None
    u_out = outs.pop(0) if emit_u else None
    su, suw, sq, sqt, sb, sems = rest

    i = pl.program_id(0)
    nslab = lx // bx
    slot = i % 2
    with_smag = smag_d2 is not None
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    W = bx + ng

    # --- DMA plans.  Window layout as in `_pcmsd_hat_kernel`: su/suw
    # positions [0, W) <-> globals [start-ng_lo, start+bx+ng_hi-1]; sq
    # positions [0, W] one plane further up; stream positions [0, bx]
    # <-> [start-1, start+bx-1].  The lo arrays feed window 0 only
    # (ring-carried thereafter); the hi arrays feed the LAST window.
    def ut_full(s):
        cps = [
            pltpu.make_async_copy(
                ut_lo.at[:, pl.ds(0, ng_lo)],
                su.at[s, :, pl.ds(0, ng_lo)], sems.at[s, 0],
            )
        ]
        if nslab == 1:
            cps.append(pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(0, bx)],
                su.at[s, :, pl.ds(ng_lo, bx)], sems.at[s, 1],
            ))
            cps.append(pltpu.make_async_copy(
                ut_hi.at[:, pl.ds(0, ng_hi)],
                su.at[s, :, pl.ds(ng_lo + bx, ng_hi)], sems.at[s, 2],
            ))
        else:
            cps.append(pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(0, bx + ng_hi)],
                su.at[s, :, pl.ds(ng_lo, bx + ng_hi)], sems.at[s, 1],
            ))
        return cps

    def ut_part(j, s):
        start = j * bx
        cps = []
        if bx > ng_hi:
            cps.append(pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(start + ng_hi, bx - ng_hi)],
                su.at[s, :, pl.ds(ng, bx - ng_hi)], sems.at[s, 0],
            ))
        return cps

    def ut_part_hi(j, s):
        # window-top ng_hi planes: local [start+bx, ng_hi), or the right
        # neighbour's for the last window (both branches signal the same
        # sem/bytes, so the wait is branch-free)
        start = j * bx
        hi_sem = sems.at[s, 1]

        @pl.when(j == nslab - 1)
        def _():
            pltpu.make_async_copy(
                ut_hi.at[:, pl.ds(0, ng_hi)],
                su.at[s, :, pl.ds(W - ng_hi, ng_hi)], hi_sem,
            ).start()

        @pl.when(j < nslab - 1)
        def _():
            pltpu.make_async_copy(
                utprev_hbm.at[:, pl.ds(jnp.minimum(start + bx, lx - ng_hi),
                                       ng_hi)],
                su.at[s, :, pl.ds(W - ng_hi, ng_hi)], hi_sem,
            ).start()

    def ut_part_hi_wait(s):
        pltpu.make_async_copy(
            utprev_hbm.at[:, pl.ds(0, ng_hi)],
            su.at[s, :, pl.ds(W - ng_hi, ng_hi)], sems.at[s, 1],
        ).wait()

    def q_full(s):
        cps = [
            pltpu.make_async_copy(
                qhat_lo.at[pl.ds(0, ng_lo)],
                sq.at[s, pl.ds(0, ng_lo)], sems.at[s, 3],
            )
        ]
        if nslab == 1:
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(0, bx)],
                sq.at[s, pl.ds(ng_lo, bx)], sems.at[s, 4],
            ))
            cps.append(pltpu.make_async_copy(
                qhat_hi.at[pl.ds(0, ng_hi + 1)],
                sq.at[s, pl.ds(ng_lo + bx, ng_hi + 1)], sems.at[s, 5],
            ))
        else:
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(0, bx + ng_hi + 1)],
                sq.at[s, pl.ds(ng_lo, bx + ng_hi + 1)], sems.at[s, 4],
            ))
        return cps

    def q_part(j, s):
        start = j * bx
        cps = []
        if bx > ng_hi + 1:
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(start + ng_hi + 1, bx - ng_hi - 1)],
                sq.at[s, pl.ds(ng + 1, bx - ng_hi - 1)], sems.at[s, 3],
            ))
        return cps

    def q_part_hi(j, s):
        start = j * bx
        hi_sem = sems.at[s, 4]

        @pl.when(j == nslab - 1)
        def _():
            pltpu.make_async_copy(
                qhat_hi.at[pl.ds(0, ng_hi + 1)],
                sq.at[s, pl.ds(W - ng_hi, ng_hi + 1)], hi_sem,
            ).start()

        @pl.when(j < nslab - 1)
        def _():
            pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(jnp.minimum(start + bx, lx - ng_hi - 1),
                                  ng_hi + 1)],
                sq.at[s, pl.ds(W - ng_hi, ng_hi + 1)], hi_sem,
            ).start()

    def q_part_hi_wait(s):
        pltpu.make_async_copy(
            qhat_hbm.at[pl.ds(0, ng_hi + 1)],
            sq.at[s, pl.ds(W - ng_hi, ng_hi + 1)], sems.at[s, 4],
        ).wait()

    s0 = 6

    def s_full(s):
        cps = []
        for q in range(n_dma):
            cps.append(pltpu.make_async_copy(
                streams_lo[q].at[:, pl.ds(0, 1)],
                sb.at[s, q, :, pl.ds(0, 1)], sems.at[s, s0 + 1 + 2 * q],
            ))
            cps.append(pltpu.make_async_copy(
                streams[q].at[:, pl.ds(0, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, s0 + 2 * q],
            ))
        return cps

    def s_part(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                streams[q].at[:, pl.ds(start, bx)],
                sb.at[s, q, :, pl.ds(1, bx)], sems.at[s, s0 + 2 * q],
            )
            for q in range(n_dma)
        ]

    @pl.when(i == 0)
    def _():
        for cp in ut_full(0) + q_full(0) + s_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in (ut_part(i + 1, 1 - slot) + q_part(i + 1, 1 - slot)
                   + s_part(i + 1, 1 - slot)):
            cp.start()
        ut_part_hi(i + 1, 1 - slot)
        q_part_hi(i + 1, 1 - slot)

    @pl.when(i == 0)
    def _():
        for cp in ut_full(0) + q_full(0) + s_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in ut_part(i, slot) + q_part(i, slot) + s_part(i, slot):
            cp.wait()
        ut_part_hi_wait(slot)
        q_part_hi_wait(slot)

    # --- reconstruction: u = ut_prev - grad(q) into suw[slot] (the
    # per-shard twin of `_pcmsd_hat_kernel`'s)
    vy_s = _prep_mat(vy_hbm, manualhigh)
    vzT_s = _prep_mat(vzT_hbm, manualhigh)

    def qtrans(p, s):
        t = _mm_h_left(vy_s, sq[s, p], manualhigh)
        return _mm_h(t, vzT_s, manualhigh)

    def recon(qlist, lo):
        w = W - lo
        qs = jnp.stack(qlist)  # (w+1, ny, nz)
        qc = qs[:w]
        suw[slot, 0, lo:W] = (
            su[slot, 0, lo:W] - (qs[1:] - qs[:-1]) / dx[0]
        )
        suw[slot, 1, lo:W] = (
            su[slot, 1, lo:W] - (_rp(qc, 1) - qc) / dx[1]
        )
        suw[slot, 2, lo:W] = (
            su[slot, 2, lo:W] - (_rp(qc, 2) - qc) / dx[2]
        )

    @pl.when(i == 0)
    def _():
        qlist = [qtrans(p, 0) for p in range(W + 1)]
        recon(qlist, 0)
        sqt[:, :] = qlist[W]

    @pl.when(i > 0)
    def _():
        qlist = [sqt[:, :]] + [qtrans(p, slot) for p in range(ng + 1, W + 1)]
        recon(qlist, ng)
        sqt[:, :] = qlist[bx]

    @pl.when(i + 1 < nslab)
    def _():
        suw[1 - slot, :, 0:ng] = suw[slot, :, bx : bx + ng]
        for q in range(n_dma):
            sb[1 - slot, q, :, 0:1] = sb[slot, q, :, bx : bx + 1]

    off = ng_lo - 2

    def at(a, lo_sh, hi_off):
        return suw[slot, a, off + lo_sh : off + bx + 3 + hi_off, :, :]

    idx_bf = m + 1 - base_is_recon
    idx_acc = idx_bf + with_bf
    if base_is_recon:
        base_fn = lambda a: suw[slot, a, ng_lo - 1 : ng_lo + bx]  # noqa: E731
    else:
        base_fn = lambda a: sb[slot, 0, a]  # noqa: E731
    _stage_tail(
        at, coeffs_smem,
        k_out, ut_out, divhat_out, usnew_out,
        vinvy_hbm, vinvzT_hbm,
        visc=visc, dx=dx, vol=vol, bx=bx, m=m, manualhigh=manualhigh,
        emit_k=emit_k, with_usnew=with_usnew,
        base=base_fn,
        kstream=lambda q, a: sb[slot, q - base_is_recon, a],
        bf=(lambda a: sb[slot, idx_bf, a]) if with_bf else None,
        usnew_base=(lambda a: sb[slot, idx_acc, a]) if with_accbase else None,
        smag=(
            (coeffs_smem[m + 1 + with_usnew], smag_d2,
             lambda a: suw[slot, a, 0:W])
            if with_smag
            else None
        ),
    )
    if emit_u:
        for a in range(3):
            u_out[a, :, :, :] = suw[slot, a, ng_lo : ng_lo + bx].astype(
                u_out.dtype
            )


def pcmsd_halo_profitable(lx, n_dma, plane_elems, with_smag=False):
    """Whether the merged halo kernel should drive the per-shard interior
    stages (same bar as `pcmsd_profitable`: a slab of >= 4 planes must
    fit the VMEM budget, else per-window DMA-issue overhead dominates).
    ``plane_elems`` is ny*nz of the shard block."""
    bx = _pick_bx(lx, _pcmsd_planes(n_dma, with_smag), plane_elems)
    return min(bx, lx) >= 4


def pcmsd_hat_halo_3d(
    ut_loc, ut_lo, ut_hi, qhat_loc, qhat_lo, qhat_hi,
    streams, streams_lo, coeffs, visc, dxs, proj,
    *, precision="manualhigh", bx=None, interpret=False,
    emit_k=True, usnew_coeff=None, bodyforce=None, bodyforce_lo=None,
    usnew_base=None, smag=None, emit_u=False,
):
    """`pcmsd_hat_3d` on an x-slab shard block with segmented halo DMAs:
    the merged pressure-correction + momentum + stage + divergence
    kernel, ghost planes ppermute'd by `parallel/halo.py`.

    ``ut_loc`` (3, lx, ny, nz) / ``qhat_loc`` (lx, ny, nz): the previous
    stage's uncorrected velocity and eigen-basis pressure;
    ``ut_lo``/``ut_hi``: the ring neighbours' (ng_lo, ng_hi) boundary
    planes of ut; ``qhat_lo``/``qhat_hi``: their (ng_lo, ng_hi+1) qhat
    planes (the x-gradient needs one more q plane above the u window).
    ``streams``/``streams_lo`` as in `momentum_stage_divhat_halo_3d`.
    Output layout matches `pcmsd_hat_3d` at local extent.
    ``streams[0] is RECON`` (with ``streams_lo[0]`` also the sentinel)
    and ``emit_u`` as in `pcmsd_hat_3d` — the step-boundary merge's
    building blocks for a per-shard (ut, qhat) hat carry."""
    D, lx, ny, nz = ut_loc.shape
    assert D == 3 and ny == nz
    with_smag = smag is not None
    ng_lo, ng_hi = (3, 2) if with_smag else (2, 1)
    ng = ng_lo + ng_hi
    assert ut_lo.shape == (3, ng_lo, ny, nz), (ut_lo.shape, ng_lo)
    assert ut_hi.shape == (3, ng_hi, ny, nz), (ut_hi.shape, ng_hi)
    assert qhat_loc.shape == (lx, ny, nz)
    assert qhat_lo.shape == (ng_lo, ny, nz), (qhat_lo.shape, ng_lo)
    assert qhat_hi.shape == (ng_hi + 1, ny, nz), (qhat_hi.shape, ng_hi)
    streams = tuple(streams)
    streams_lo = tuple(streams_lo)
    coeffs = tuple(coeffs)
    m = len(streams) - 1
    assert len(coeffs) == m + 1 and len(streams_lo) == m + 1
    base_is_recon = streams[0] is RECON
    if base_is_recon:
        assert m == 0, "RECON base allows no k streams"
        # the documented contract: a RECON base has no lower-plane data
        # either — catch a caller passing a real array that would be
        # silently discarded
        assert streams_lo[0] is RECON, "streams_lo[0] must be RECON too"
        streams = streams[1:]
        streams_lo = streams_lo[1:]
    for st in streams:
        assert st.shape == (3, lx, ny, nz), (st.shape, lx)
    with_bf = bodyforce is not None
    with_accbase = usnew_base is not None
    assert not (with_accbase and usnew_coeff is None)
    if with_bf:
        streams = streams + (bodyforce,)
        streams_lo = streams_lo + (bodyforce_lo,)
    if with_accbase:
        # the accbase window's lower ghost plane is never read (usnew is
        # elementwise on the output planes) — feed its own first plane
        streams = streams + (usnew_base,)
        streams_lo = streams_lo + (
            jax.lax.slice_in_dim(usnew_base, 0, 1, axis=1),
        )
    n_dma = len(streams)
    vol = float(np.prod(dxs))
    with_usnew = usnew_coeff is not None
    if bx is None:
        bx = _pick_bx(lx, _pcmsd_planes(n_dma, with_smag, emit_u), ny * nz)
    while lx % bx != 0:
        bx //= 2
    # the partial windows' branched top DMAs need bx >= ng_hi + 1
    while bx < ng_hi + 1:
        bx *= 2
    assert lx % bx == 0 and bx >= ng_hi + 1, (lx, bx, ng_hi)
    kernel = functools.partial(
        _pcmsd_hat_halo_kernel,
        visc=float(visc),
        dx=tuple(map(float, dxs)),
        vol=vol,
        bx=bx,
        lx=lx,
        manualhigh=(precision == "manualhigh"),
        m=m,
        emit_k=emit_k,
        with_usnew=with_usnew,
        with_bf=with_bf,
        with_accbase=with_accbase,
        smag_d2=(float(smag[1]) if with_smag else None),
        base_is_recon=base_is_recon,
        emit_u=emit_u,
    )
    all_coeffs = (
        list(coeffs)
        + ([usnew_coeff] if with_usnew else [])
        + ([smag[0]] if with_smag else [])
    )
    coeff_arr = jnp.stack(
        [jnp.asarray(c, ut_loc.dtype) for c in all_coeffs]
    ).reshape(len(all_coeffs))
    vec_spec = pl.BlockSpec(
        (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    sca_spec = pl.BlockSpec(
        (bx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_shape = jax.ShapeDtypeStruct((3, lx, ny, nz), ut_loc.dtype)
    out_specs = (
        ([vec_spec] if emit_k else [])
        + [vec_spec, sca_spec]
        + ([vec_spec] if with_usnew else [])
        + ([vec_spec] if emit_u else [])
    )
    out_shape = (
        ([vec_shape] if emit_k else [])
        + [vec_shape, jax.ShapeDtypeStruct((lx, ny, nz), ut_loc.dtype)]
        + ([vec_shape] if with_usnew else [])
        + ([vec_shape] if emit_u else [])
    )
    return pl.pallas_call(
        kernel,
        grid=(lx // bx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (6 + 2 * n_dma)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx + ng, ny, nz), ut_loc.dtype),
            pltpu.VMEM((2, 3, bx + ng, ny, nz), ut_loc.dtype),
            pltpu.VMEM((2, bx + ng + 1, ny, nz), ut_loc.dtype),
            pltpu.VMEM((ny, nz), ut_loc.dtype),
            pltpu.VMEM((2, max(n_dma, 1), 3, bx + 1, ny, nz), ut_loc.dtype),
            pltpu.SemaphoreType.DMA((2, 6 + 2 * max(n_dma, 1))),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        coeff_arr, ut_loc, ut_lo, ut_hi, qhat_loc, qhat_lo, qhat_hi,
        *streams, *streams_lo,
        proj["V"], proj["VT"], proj["Vinv"], proj["VinvT"],
    )


def _pc_qhat_kernel(
    ut_hbm, qhat_hbm, vy_hbm, vzT_hbm, u_out, su, sq, sqt, sems,
    *, dx, bx, n, manualhigh,
):
    """pressure_correct + in-kernel z/y inverse transform of qhat: the
    Poisson solve's pass C rides the correction kernel's DMA.

    Ring carry: window j's LOW qhat plane (global start) is window j-1's
    upper ghost — its inverse transform is carried in scratch ``sqt``
    instead of re-DMA'd and re-transformed, so both the qhat HBM reads
    and the MXU inverse-transform work are exactly 1x."""
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    def q_full(s):
        # window 0: planes [0, bx] (positions 0..bx)
        return [
            pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(0, bx)], sq.at[s, pl.ds(0, bx)],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(bx % n, 1)], sq.at[s, pl.ds(bx, 1)],
                sems.at[s, 2],
            ),
        ]

    def q_part(j, s):
        # window j > 0: position 0 carried (transformed) in sqt
        start = j * bx
        cps = []
        if bx > 1:
            cps.append(pltpu.make_async_copy(
                qhat_hbm.at[pl.ds(start + 1, bx - 1)],
                sq.at[s, pl.ds(1, bx - 1)], sems.at[s, 1],
            ))
        cps.append(pltpu.make_async_copy(
            qhat_hbm.at[pl.ds((start + bx) % n, 1)],
            sq.at[s, pl.ds(bx, 1)], sems.at[s, 2],
        ))
        return cps

    def ut_cp(j, s):
        return [pltpu.make_async_copy(
            ut_hbm.at[:, pl.ds(j * bx, bx)], su.at[s], sems.at[s, 0],
        )]

    @pl.when(i == 0)
    def _():
        for cp in ut_cp(0, 0) + q_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in ut_cp(i + 1, 1 - slot) + q_part(i + 1, 1 - slot):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in ut_cp(0, 0) + q_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in ut_cp(i, slot) + q_part(i, slot):
            cp.wait()

    # inverse transform: q = V_y @ qhat @ V_z^T.  Plane 0 comes from the
    # carry scratch (seeded at window 0), planes 1..bx are computed.
    vy_s = _prep_mat(vy_hbm, manualhigh)
    vzT_s = _prep_mat(vzT_hbm, manualhigh)

    @pl.when(i == 0)
    def _():
        t0 = _mm_h_left(vy_s, sq[0, 0], manualhigh)
        sqt[:, :] = _mm_h(t0, vzT_s, manualhigh)

    qplanes = [sqt[:, :]]
    for p in range(1, bx + 1):
        t = _mm_h_left(vy_s, sq[slot, p], manualhigh)
        qplanes.append(_mm_h(t, vzT_s, manualhigh))
    sqt[:, :] = qplanes[bx]
    qw = jnp.stack(qplanes)  # (bx+1, n, n)

    def rp(v, axis):
        return pltpu.roll(v, v.shape[axis] - 1, axis)

    qc = qw[:bx]
    for a in range(3):
        if a == 0:
            g = (qw[1:] - qw[:-1]) / dx[0]
        else:
            g = (rp(qc, a) - qc) / dx[a]
        u_out[a, :, :, :] = (su[slot, a] - g).astype(u_out.dtype)


def pressure_correct_qhat_3d(
    ut_int, qhat, dxs, vy, vzT, *, precision="manualhigh", bx=None,
    interpret=False, out_dtype=None,
):
    """u = ut - grad(q) where q is given in the z/y eigen-basis
    (``qhat``); the inverse transform happens in-kernel (fused Poisson
    pass C).  ``ut_int`` may be stored bf16 (the hat carry's stream
    dtype) — the correction then computes and emits u at qhat's
    (compute) dtype."""
    D, n, ny, nz = ut_int.shape
    assert D == 3 and n == ny == nz
    cdtype = qhat.dtype
    odtype = cdtype if out_dtype is None else out_dtype
    if bx is None:
        bx = _pick_bx(n, lambda b: 14 * b + 2)
    while n % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _pc_qhat_kernel,
        dx=tuple(map(float, dxs)),
        bx=bx,
        n=n,
        manualhigh=(precision == "manualhigh"),
    )
    return pl.pallas_call(
        kernel,
        grid=(n // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, bx, n, n), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, n, n, n), odtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx, n, n), ut_int.dtype),
            pltpu.VMEM((2, bx + 1, n, n), cdtype),
            pltpu.VMEM((n, n), cdtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(ut_int, qhat, vy, vzT)


def _pressure_correct_kernel(ut_hbm, q_hbm, u_out, su, sq, sems, *, dx, bx, n):
    """u = ut - grad(q): gradient at plane p needs q[p+1] (one upper ghost
    plane); y/z upper neighbours are in-VMEM rolls."""
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    # ring-carry: window j's low q plane (global start) is window j-1's
    # upper ghost — VMEM-copied instead of re-read
    def q_full(s):
        return [
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(0, bx)], sq.at[s, pl.ds(0, bx)],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(bx % n, 1)], sq.at[s, pl.ds(bx, 1)],
                sems.at[s, 2],
            ),
        ]

    def q_part(j, s):
        start = j * bx
        cps = []
        if bx > 1:
            cps.append(pltpu.make_async_copy(
                q_hbm.at[pl.ds(start + 1, bx - 1)],
                sq.at[s, pl.ds(1, bx - 1)], sems.at[s, 1],
            ))
        cps.append(pltpu.make_async_copy(
            q_hbm.at[pl.ds((start + bx) % n, 1)],
            sq.at[s, pl.ds(bx, 1)], sems.at[s, 2],
        ))
        return cps

    def ut_cp(j, s):
        return [pltpu.make_async_copy(
            ut_hbm.at[:, pl.ds(j * bx, bx)], su.at[s], sems.at[s, 0],
        )]

    @pl.when(i == 0)
    def _():
        for cp in ut_cp(0, 0) + q_full(0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in ut_cp(i + 1, 1 - slot) + q_part(i + 1, 1 - slot):
            cp.start()

    @pl.when(i == 0)
    def _():
        for cp in ut_cp(0, 0) + q_full(0):
            cp.wait()

    @pl.when(i > 0)
    def _():
        for cp in ut_cp(i, slot) + q_part(i, slot):
            cp.wait()

    @pl.when(i + 1 < nslab)
    def _():
        sq[1 - slot, 0:1] = sq[slot, bx : bx + 1]

    qw = sq[slot]  # (bx+1, n, n)
    qc = qw[:bx]
    for a in range(3):
        if a == 0:
            g = (qw[1:] - qw[:-1]) / dx[0]
        else:
            g = (pltpu.roll(qc, qc.shape[a] - 1, a) - qc) / dx[a]
        u_out[a, :, :, :] = su[slot, a] - g


def pressure_correct_3d(ut_int, q_int, dxs, *, bx=None, interpret=False):
    """Apply the pressure correction `u = ut - grad(q)` on interior-layout
    fields in one HBM pass (reference applypressure!,
    src/operators.jl:214-288, uniform periodic case).  Any (nx, ny, nz)
    box; x wraps periodically (halo-padded shard blocks discard the two
    edge output planes)."""
    D, nx, ny, nz = ut_int.shape
    assert D == 3
    if bx is None:
        bx = _pick_bx(nx, lambda b: 14 * b + 2, ny * nz)
    while nx % bx != 0:
        bx //= 2
    kernel = functools.partial(
        _pressure_correct_kernel, dx=tuple(map(float, dxs)), bx=bx, n=nx
    )
    return pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), ut_int.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bx, ny, nz), ut_int.dtype),
            pltpu.VMEM((2, bx + 1, ny, nz), ut_int.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(ut_int, q_int)
