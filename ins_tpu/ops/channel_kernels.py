"""Pallas slab kernels for the wall-bounded channel fast path.

Same slab-DMA architecture as the periodic-cube kernels
(`ops/pallas_kernels.py`): the x-grid is cut into bx-plane slabs, each
window double-buffered from HBM while the previous one computes; y/z
neighbor access is on-chip `pltpu.roll`.  The channel twist
(`ops/channelpath.py` module docs): the z (lane) axis is a stretched
Dirichlet wall axis, so

- all z coefficients are 1-D metric vectors streamed once into VMEM as
  a packed ``(16, nz)`` block and broadcast across sublanes;
- u/v z-rolls are corrected at the wall lanes with a select against the
  (static) wall velocity;
- w needs no correction at all: its pinned top slot is 0, which every
  wrap-around delivers as exactly the bottom-wall ghost.

`channel_msd_3d` fuses momentum (conv-diff + steady force), the
classic-row tableau update (stage velocity + b-row accumulator) and the
stage divergence into ONE HBM pass over the velocity, mirroring the
periodic path's `momentum_stage_div_3d`.  The projection between the
kernels is the XLA fast-diagonalization solve (MXU contractions,
`ops/fdm.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _pick_bx

__all__ = [
    "channel_kernels_supported",
    "channel_msd_3d",
    "channel_pressure_correct_3d",
    "pack_zmet",
]

_ZVECS = (
    "inv_dz", "inv_da_t", "inv_db_t", "inv_duz", "inv_da_n", "inv_db_n",
    "az1", "az2", "azz_m1", "azz_m2", "azz_c1", "azz_c2",
)


def channel_kernels_supported(setup):
    """TPU backend + lane/sublane-aligned transverse extents."""
    g = setup.grid
    ny, nz = g.Np[1], g.Np[2]
    if nz % 128 != 0 or ny % 8 != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pack_zmet(met, nz, dtype):
    """Pack the z-metric vectors into a (16, nz) block (sublane-tiled)."""
    rows = [np.asarray(getattr(met, name), np.float64) for name in _ZVECS]
    block = np.zeros((16, nz), np.float64)
    for j, r in enumerate(rows):
        assert r.shape == (nz,), (j, r.shape)
        block[j] = r
    return jnp.asarray(block, dtype)


def _rp(v, axis):
    return pltpu.roll(v, v.shape[axis] - 1, axis)


def _rm(v, axis):
    return pltpu.roll(v, 1, axis)


def _zv(zmet, name, nz):
    return zmet[_ZVECS.index(name)].reshape(1, 1, nz)


def _lane(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _channel_convdiff(at, zmet, *, visc, dx, dy, gb, gt, nz):
    """Conv-diff for all three components on the k-plane window.

    ``at(a, lo_sh, hi_off)`` returns planes [lo_sh, W+hi_off) of the
    (W = bx+3)-plane component window; k is computed on the bx+1 center
    planes [1, W-1).  Mirrors `channelpath.channel_convdiff_roll`
    exactly (the f64 interpret-mode parity tests pin it)."""
    z = lambda name: _zv(zmet, name, nz)
    fs = []
    w_c = at(2, 1, -1)

    for a in (0, 1):
        u_c = at(a, 1, -1)
        # b = x: shifted-flux over the extended window
        uE = at(a, 0, 0)
        uab2E = 0.5 * (uE[:-1] + uE[1:])
        if a == 0:
            ubaE = uab2E
        else:
            uxE = at(0, 0, -1)
            ubaE = 0.5 * (uxE + _rp(uxE, a))
        phiE = uab2E * ubaE
        f = (phiE[:-1] - phiE[1:]) / dx
        f += (visc / (dx * dx)) * (at(a, 2, 0) - 2.0 * u_c + at(a, 0, -2))
        # b = y (uniform periodic)
        byy = 1
        u_pb = _rp(u_c, byy)
        u_mb = _rm(u_c, byy)
        f += (visc / (dy * dy)) * (u_pb - 2.0 * u_c + u_mb)
        uab2 = 0.5 * (u_c + u_pb)
        if a == 1:
            uba2 = uab2
        else:
            ub_c = at(1, 1, -1)
            uba2 = 0.5 * (ub_c + at(1, 2, 0))
        phi = uab2 * uba2
        f -= (phi - _rm(phi, byy)) / dy
        # b = z (stretched Dirichlet): masked u/v shifts, free w wraps
        lane = _lane(u_c.shape)
        u_zp = jnp.where(lane == nz - 1, gt[a], _rp(u_c, 2))
        u_zm = jnp.where(lane == 0, gb[a], _rm(u_c, 2))
        uab2 = 0.5 * (u_c + u_zp)
        w_pa = at(2, 2, 0) if a == 0 else _rp(w_c, a)
        uba2 = 0.5 * (w_c + w_pa)
        phi2 = uab2 * uba2  # lane nz-1 is 0 (pinned w) = the wall flux
        f -= (phi2 - _rm(phi2, 2)) * z("inv_dz")
        d_hi = (u_zp - u_c) * z("inv_db_t")
        d_lo = (u_c - u_zm) * z("inv_da_t")
        f += visc * (d_hi - d_lo) * z("inv_dz")
        fs.append(f)

    # normal component
    f = None
    # b = x: shifted flux
    wE = at(2, 0, 0)
    uab2E = 0.5 * (wE[:-1] + wE[1:])
    u0E = at(0, 0, -1)
    ubaE = z("az2") * u0E + z("az1") * _rp(u0E, 2)
    phiE = uab2E * ubaE
    f = (phiE[:-1] - phiE[1:]) / dx
    f += (visc / (dx * dx)) * (at(2, 2, 0) - 2.0 * w_c + at(2, 0, -2))
    # b = y
    w_pb = _rp(w_c, 1)
    w_mb = _rm(w_c, 1)
    f += (visc / (dy * dy)) * (w_pb - 2.0 * w_c + w_mb)
    u1_c = at(1, 1, -1)
    uab2 = 0.5 * (w_c + w_pb)
    uba2 = z("az2") * u1_c + z("az1") * _rp(u1_c, 2)
    phi = uab2 * uba2
    f -= (phi - _rm(phi, 1)) / dy
    # b = z (own axis): both fluxes direct, wraps are exact
    w_zp = _rp(w_c, 2)
    w_zm = _rm(w_c, 2)
    uab2 = 0.5 * (w_c + w_zp)
    uab1 = 0.5 * (w_zm + w_c)
    uba2 = z("azz_c2") * w_c + z("azz_c1") * w_zp
    uba1 = z("azz_m2") * w_zm + z("azz_m1") * w_c
    f -= (uab2 * uba2 - uab1 * uba1) * z("inv_duz")
    d_hi = (w_zp - w_c) * z("inv_db_n")
    d_lo = (w_c - w_zm) * z("inv_da_n")
    f += visc * (d_hi - d_lo) * z("inv_duz")
    lane = _lane(f.shape)
    f = jnp.where(lane == nz - 1, jnp.zeros((), f.dtype), f)
    fs.append(f)
    return fs


def _channel_msd_kernel(
    # refs: coeffs(SMEM), u|t, [q], [ustart], [acc], [force], zmet
    #       | outs ([urec], [us], acc, div) | scratch
    *refs,
    visc, dx, dy, gb, gt, nz, bx, n,
    has_acc, has_force, use_cb, div_of_acc, emit_us,
    recon, has_ustart, emit_urec,
):
    nout = emit_urec + emit_us + 2
    (coeffs_smem, u_hbm), rest = refs[:2], refs[2:]
    q_hbm = rest[0] if recon else None
    rest = rest[1:] if recon else rest
    ustart_hbm = rest[0] if has_ustart else None
    rest = rest[1:] if has_ustart else rest
    acc_hbm = rest[0] if has_acc else None
    rest = rest[1:] if has_acc else rest
    force_hbm = rest[0] if has_force else None
    rest = rest[1:] if has_force else rest
    zmet_ref = rest[0]
    outs = rest[1 : 1 + nout]
    if emit_urec:
        urec_out, outs = outs[0], outs[1:]
    if emit_us:
        us_out, acc_out, div_out = outs
    else:
        acc_out, div_out = outs
    if recon:
        su, ss, sq, srec, sems = rest[1 + nout : 6 + nout]
    else:
        su, ss, sems = rest[1 + nout : 4 + nout]
    ca = coeffs_smem[0]
    cb = coeffs_smem[1]

    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    def win_copies(j, s):
        """DMAs for window j into buffer s: u planes [jbx-2 .. jbx+bx]
        (x-wrapped), stream planes [jbx-1 .. jbx+bx-1]; in recon mode
        also the q planes [jbx-2 .. jbx+bx+1]."""
        start = j * bx
        cps = []
        # u (or projection-target) window: segments handle the wrap
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start - 2) % n, 1)],
            su.at[s, :, pl.ds(0, 1)], sems.at[s, 0],
        ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start - 1) % n, 1)],
            su.at[s, :, pl.ds(1, 1)], sems.at[s, 1],
        ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(start, bx)],
            su.at[s, :, pl.ds(2, bx)], sems.at[s, 2],
        ))
        cps.append(pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((start + bx) % n, 1)],
            su.at[s, :, pl.ds(bx + 2, 1)], sems.at[s, 3],
        ))
        # streams: [start-1] wrapped + [start, bx]
        for m, hbm in enumerate(
            ([ustart_hbm] if has_ustart else [])
            + ([acc_hbm] if has_acc else [])
            + ([force_hbm] if has_force else [])
        ):
            cps.append(pltpu.make_async_copy(
                hbm.at[:, pl.ds((start - 1) % n, 1)],
                ss.at[s, m, :, pl.ds(0, 1)], sems.at[s, 4 + 2 * m],
            ))
            cps.append(pltpu.make_async_copy(
                hbm.at[:, pl.ds(start, bx)],
                ss.at[s, m, :, pl.ds(1, bx)], sems.at[s, 5 + 2 * m],
            ))
        if recon:
            # q window: planes [start-2 .. start+bx+1] (bx+4, x-wrapped)
            base = 4 + 2 * (has_ustart + has_acc + has_force)
            for seg, (off, cnt) in enumerate(
                [(-2, 1), (-1, 1), (0, bx), (bx, 1), (bx + 1, 1)]
            ):
                cps.append(pltpu.make_async_copy(
                    q_hbm.at[pl.ds((start + off) % n, cnt)],
                    sq.at[s, pl.ds(seg if seg < 3 else bx + seg - 1, cnt)],
                    sems.at[s, base + seg],
                ))
        return cps

    @pl.when(i == 0)
    def _():
        for cp in win_copies(0, 0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in win_copies(i + 1, 1 - slot):
            cp.start()

    for cp in win_copies(i, slot):
        cp.wait()

    zmet = zmet_ref[...]

    if recon:
        # Reconstruct the projected velocity u = t - grad(q)/Delta_u on
        # the full (bx+3)-plane window (same math as _channel_pc_kernel;
        # window plane p holds x index start-2+p, q plane p aligns).
        qw = sq[slot]
        qc = qw[0 : bx + 3]
        srec[0, :, :, :] = su[slot, 0] - (qw[1 : bx + 4] - qc) / dx
        srec[1, :, :, :] = su[slot, 1] - (_rp(qc, 1) - qc) / dy
        srec[2, :, :, :] = (
            su[slot, 2] - (_rp(qc, 2) - qc) * _zv(zmet, "inv_duz", nz)
        )

        def at(a, lo_sh, hi_off):
            return srec[a, lo_sh : bx + 3 + hi_off, :, :]

        if emit_urec:
            urec_out[:, :, :, :] = srec[:, 2 : bx + 2]
    else:

        def at(a, lo_sh, hi_off):
            return su[slot, a, lo_sh : bx + 3 + hi_off, :, :]

    ks = _channel_convdiff(
        at, zmet, visc=visc, dx=dx, dy=dy, gb=gb, gt=gt, nz=nz
    )

    target = []
    for a in range(3):
        k = ks[a]
        if has_force:
            k = k + ss[slot, int(has_ustart) + int(has_acc), a, :, :, :]
        if has_acc:
            accw = ss[slot, int(has_ustart), a]
        elif has_ustart:
            accw = ss[slot, 0, a]
        else:
            # stage-0 recon: the accumulator base IS the reconstructed
            # start velocity (planes [start-1 .. start+bx) of srec)
            accw = srec[a, 1 : bx + 2]
        accn = accw + cb * k if use_cb else accw
        acc_out[a, :, :, :] = accn[1:]
        if emit_us:
            usw = ss[slot, 0, a] if has_ustart else srec[a, 1 : bx + 2]
            usn = usw + ca * k
            us_out[a, :, :, :] = usn[1:]
            target.append(usn)
        else:
            target.append(accn)

    t0, t1, t2 = target
    div = (t0[1:] - t0[:-1]) / dx
    div += (t1[1:] - _rm(t1[1:], 1)) / dy
    div += (t2[1:] - _rm(t2[1:], 2)) * _zv(zmet, "inv_dz", nz)
    div_out[:, :, :] = div


def channel_msd_3d(u, ustart, acc, met, *, visc, ca, cb, dt,
                   force=None, div_of_acc=False, qrecon=None,
                   emit_urec=False, bx=None, interpret=False):
    """Fused momentum + classic-row tableau + stage divergence.

    Returns ``(us, acc_out, div)`` (``(urec, us, acc_out, div)`` when
    ``emit_urec``): the stage velocity ``ustart + dt*ca*k`` (None on
    the final stage), the b-row accumulator ``acc + dt*cb*k``
    (``acc=None`` means the accumulator is still ustart), and the
    divergence of the projection target (``acc_out`` when
    ``div_of_acc`` else ``us``).

    Merged-projection (hat-carry) mode: with ``qrecon`` given, ``u`` is
    the previous stage's UNPROJECTED target and the kernel reconstructs
    the projected velocity ``u - grad(qrecon)/Delta_u`` in VMEM (the
    separate `channel_pressure_correct_3d` pass and its HBM round-trip
    disappear).  ``ustart=None`` with ``qrecon`` means stage 0 of a
    hat-carried step: the reconstruction doubles as the start velocity
    (and is emitted once via ``emit_urec`` for later stages to stream).
    """
    D, nx, ny, nz = u.shape
    assert D == 3
    dtype = u.dtype
    recon = qrecon is not None
    has_ustart = ustart is not None
    assert has_ustart or recon
    has_acc = acc is not None
    has_force = force is not None
    emit_us = not div_of_acc
    assert not emit_urec or (recon and not has_ustart)
    nstream = has_ustart + has_acc + has_force
    if bx is None:
        bx = _pick_bx(
            nx,
            lambda b: 2 * (3 * (b + 3) + 3 * nstream * (b + 1))
            + (3 * emit_us + 3 * emit_urec + 4) * b + 24
            + (2 * (b + 4) + 3 * (b + 3)) * recon,
            ny * nz,
            candidates=(16, 8, 4, 2, 1),
        )
    while nx % bx != 0:
        bx //= 2

    # dt-scaled tableau coefficients ride in SMEM (traced dt supported,
    # same pattern as the periodic-path kernels)
    coeffs = jnp.stack([
        jnp.asarray(dt * ca, dtype), jnp.asarray(dt * cb, dtype)
    ]).reshape(2)

    zmet = pack_zmet(met, nz, dtype)
    kernel = functools.partial(
        _channel_msd_kernel,
        visc=float(visc), dx=float(met.dx), dy=float(met.dy),
        gb=tuple(map(float, met.gb)), gt=tuple(map(float, met.gt)),
        nz=nz, bx=bx, n=nx,
        has_acc=has_acc, has_force=has_force, use_cb=cb != 0.0,
        div_of_acc=div_of_acc, emit_us=emit_us,
        recon=recon, has_ustart=has_ustart, emit_urec=emit_urec,
    )
    out_shape = []
    out_specs = []
    if emit_urec:
        out_shape.append(jax.ShapeDtypeStruct((3, nx, ny, nz), dtype))
        out_specs.append(pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    if emit_us:
        out_shape.append(jax.ShapeDtypeStruct((3, nx, ny, nz), dtype))
        out_specs.append(pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    out_shape.append(jax.ShapeDtypeStruct((3, nx, ny, nz), dtype))
    out_specs.append(pl.BlockSpec(
        (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    ))
    out_shape.append(jax.ShapeDtypeStruct((nx, ny, nz), dtype))
    out_specs.append(pl.BlockSpec(
        (bx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    ))

    ins = [coeffs, u]
    if recon:
        ins.append(qrecon)
    if has_ustart:
        ins.append(ustart)
    if has_acc:
        ins.append(acc)
    if has_force:
        ins.append(force)
    ins.append(zmet)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (len(ins) - 2)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )

    scratch = [
        pltpu.VMEM((2, 3, bx + 3, ny, nz), dtype),
        pltpu.VMEM((2, max(nstream, 1), 3, bx + 1, ny, nz), dtype),
    ]
    if recon:
        scratch.append(pltpu.VMEM((2, bx + 4, ny, nz), dtype))
        scratch.append(pltpu.VMEM((3, bx + 3, ny, nz), dtype))
    scratch.append(
        pltpu.SemaphoreType.DMA((2, 4 + 2 * nstream + 5 * recon))
    )

    res = pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    res = list(res)
    urec = res.pop(0) if emit_urec else None
    us = res.pop(0) if emit_us else None
    acc_out, div = res
    if emit_urec:
        return urec, us, acc_out, div
    return us, acc_out, div


def _channel_pc_kernel(t_hbm, q_hbm, zmet_ref, u_out, sq, sems,
                       *, dx, dy, nz, bx, n):
    i = pl.program_id(0)
    nslab = n // bx
    slot = i % 2

    def q_copies(j, s):
        start = j * bx
        return [
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(start, bx)],
                sq.at[s, pl.ds(0, bx)], sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                q_hbm.at[pl.ds((start + bx) % n, 1)],
                sq.at[s, pl.ds(bx, 1)], sems.at[s, 1],
            ),
        ]

    @pl.when(i == 0)
    def _():
        for cp in q_copies(0, 0):
            cp.start()

    @pl.when(i + 1 < nslab)
    def _():
        for cp in q_copies(i + 1, 1 - slot):
            cp.start()

    for cp in q_copies(i, slot):
        cp.wait()

    zmet = zmet_ref[...]
    q = sq[slot, 0:bx]
    q_xp = sq[slot, 1 : bx + 1]
    u_out[0, :, :, :] = t_hbm[0] - (q_xp - q) / dx
    u_out[1, :, :, :] = t_hbm[1] - (_rp(q, 1) - q) / dy
    u_out[2, :, :, :] = t_hbm[2] - (_rp(q, 2) - q) * _zv(zmet, "inv_duz", nz)


def channel_pressure_correct_3d(target, q, met, *, bx=None, interpret=False):
    """u = target - grad(q)/Delta_u on the interior channel layout."""
    D, nx, ny, nz = target.shape
    dtype = target.dtype
    if bx is None:
        bx = _pick_bx(nx, lambda b: 2 * (b + 1) + 7 * b + 12, ny * nz,
                      candidates=(16, 8, 4, 2, 1))
    while nx % bx != 0:
        bx //= 2
    zmet = pack_zmet(met, nz, dtype)
    kernel = functools.partial(
        _channel_pc_kernel,
        dx=float(met.dx), dy=float(met.dy), nz=nz, bx=bx, n=nx,
    )
    return pl.pallas_call(
        kernel,
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec(
                (3, bx, ny, nz), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, bx, ny, nz), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bx + 1, ny, nz), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(target, q, zmet)
