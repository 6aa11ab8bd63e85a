"""Pallas 3-pass Poisson solve for uniform periodic grids.

The MXU eigen-matmul Poisson solve (ops/dft.py `make_poisson_mm`) runs as
6 XLA tensor contractions = 6 full HBM passes.  This module computes the
same fast-diagonalization solve in 3 Pallas passes:

  pass A (x-slabs):  z-forward + y-forward            (1 HBM pass)
  pass B (y-blocks): x-forward, eigen-scale, x-inverse (1 HBM pass)
  pass C (x-slabs):  y-inverse + z-inverse            (1 HBM pass)

Two precision modes for the transform matmuls (measured at 256^3, v5e,
benchmarks/poisson_probe.py):

- "highest": f32 via 6 bf16 MXU passes.  Residual 1.6e-6 (f32-exact),
  3.05 ms/solve in-graph — ties the XLA formulation (the solve is
  MXU-bound, not HBM-bound, at this precision).
- "manualhigh": ~Precision.HIGH cost — 3 bf16 MXU passes per matmul
  (hi*hi + hi*lo + lo*hi with an f32 split; Pallas rejects
  precision=HIGH directly).  Residual 4.4e-5, 2.42 ms/solve.

Reference solver being replaced: psolver_spectral, src/pressure.jl
:295-330 (redesigned for the MXU; XLA's fused TPU FFT is both slower and
inaccurate at 256^3 — see ops/dft.py module docs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft import fourier_eigenbasis

__all__ = [
    "poisson_pallas_supported",
    "make_poisson_pallas",
    "make_fused_projection",
    "make_passB_sharded",
]

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def poisson_pallas_supported(Np):
    """Cube with lane-aligned extent, large enough that the per-plane
    transform matmuls fill the MXU (at 128^3 the 128x128 dots are
    latency-bound and the XLA 6-contraction formulation wins: measured
    3.13 vs 2.83 ms/step end-to-end)."""
    return (
        len(Np) == 3
        and Np[0] == Np[1] == Np[2]
        and Np[2] % 128 == 0
        and Np[0] >= 256
    )


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_h(a, b, prec, dn=None):
    """Matmul at ~Precision.HIGH cost when ``prec is None``: 3 bf16 MXU
    passes (hi*hi + hi*lo + lo*hi) with f32 accumulate.  Explicit-``prec``
    (the "highest" path) accumulates in the input dtype, so f64
    interpret-mode tests stay f64-exact."""
    kw = dict(
        preferred_element_type=(
            jnp.float32
            if prec is None
            else jnp.promote_types(jnp.result_type(a, b), jnp.float32)
        )
    )
    if dn is None:
        op = lambda x, y: jnp.dot(x, y, **kw)
    else:
        op = lambda x, y: lax.dot_general(x, y, dimension_numbers=dn, **kw)
    if prec is not None:
        if dn is None:
            return jnp.dot(a, b, precision=prec, **kw)
        return lax.dot_general(a, b, dimension_numbers=dn, precision=prec, **kw)
    ah, al = _split(a)
    bh, bl = _split(b)
    return op(ah, bh) + op(ah, bl) + op(al, bh)


def _passA_kernel(f_ref, vinvy_ref, vinvzT_ref, out_ref, *, bx, n, prec):
    t = _dot_h(f_ref[...].reshape(bx * n, n), vinvzT_ref[...], prec).reshape(
        bx, n, n
    )
    for xi in range(bx):
        out_ref[xi, :, :] = _dot_h(vinvy_ref[...], t[xi], prec)


def _lam(idx, d, n, dxs, ftype=jnp.float32):
    """Second-difference eigenvalue -4 sin^2(pi*k/n)/dx^2 at frequency
    index k = ceil(idx/2) (eigenbasis ordering [const, cos_1, sin_1,
    ..., Nyquist] of ops/dft.py `fourier_eigenbasis`)."""
    kk = (idx + 1) // 2
    s = jnp.sin((np.pi / n) * kk.astype(ftype))
    return (-4.0 / (dxs[d] * dxs[d])) * s * s


def _passB_body(h_ref, vinvx_ref, vx_ref, out_ref, iy0,
                *, by, n, prec, eps, dxs, vol):
    """x-forward, eigen-scale, x-inverse.  The eigenvalue denominator is
    generated in-kernel from its closed form (a precomputed (n,n,n)
    constant would bloat the compile payload by n^3*4 bytes — 512 MB at
    512^3 — and cost an extra HBM read per solve).  ``iy0`` is the
    block's global y index offset (traced when the y axis is sharded)."""
    dn = (((1,), (0,)), ((), ()))
    g = _dot_h(vinvx_ref[...], h_ref[...], prec, dn)

    ftype = g.dtype
    shape = (n, by, n)
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + iy0
    iz = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    den = vol * (
        _lam(ix, 0, n, dxs, ftype) + _lam(iy, 1, n, dxs, ftype)
        + _lam(iz, 2, n, dxs, ftype)
    )
    inv = jnp.where(
        jnp.abs(den) < eps, 0.0, 1.0 / jnp.where(den == 0.0, 1.0, den)
    )
    g = g * inv
    out_ref[...] = _dot_h(vx_ref[...], g, prec, dn)


def _passB_fold_body(h_ref, mat_refs, out_ref, iy0,
                     *, by, n, prec, eps, dxs, vol, levels):
    """Radix-2 (decimation-in-frequency) folded pass B.

    Even-frequency basis functions are n/2-periodic (symmetric under the
    half-domain shift j -> j + n/2), odd-frequency ones antisymmetric,
    so with e = h[:n/2] + h[n/2:] and o = h[:n/2] - h[n/2:] the n x n
    transform matmuls split into (n/2)-sized ones on CONTIGUOUS slices
    (no data reversal — the (j, n-j) reflection pairing would need one,
    and Mosaic has no rev):

        g_o = R_o @ o   (frequencies k = 2*(r//2) + 1)
        q_o = S_o @ (g_o * inv_den)
        q_e = 0.5 * solve_{n/2}(e)   (the even half-basis IS the
              n/2-point eigenbasis scaled by 1/sqrt(2), with true
              frequencies 2k' — so the even branch RECURSES)
        out[:n/2] = q_e + q_o;  out[n/2:] = q_e - q_o

    One fold halves the MXU work; each recursion level removes another
    quarter of the remainder (512^3 with 2 levels: 0.375x the dense
    cost).  ``mat_refs``: [R_o^0, S_o^0, ..., R_o^{L-1}, S_o^{L-1},
    Vinv_leaf, V_leaf].  The y/z directions stay in the standard paired
    ordering."""
    dn = (((1,), (0,)), ((), ()))
    ftype = h_ref.dtype if prec is not None else jnp.float32
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, by, n), 1) + iy0
    iz = jax.lax.broadcasted_iota(jnp.int32, (1, by, n), 2)
    lam_yz = _lam(iy, 1, n, dxs, ftype) + _lam(iz, 2, n, dxs, ftype)

    def lamx(k):
        s = jnp.sin((np.pi / n) * k.astype(ftype))
        return (-4.0 / (dxs[0] * dxs[0])) * s * s

    def scale(g, k):
        den = vol * (lamx(k) + lam_yz)
        inv = jnp.where(
            jnp.abs(den) < eps, 0.0, 1.0 / jnp.where(den == 0.0, 1.0, den)
        )
        return g * inv

    def solve(hb, lvl, kmul):
        nn = hb.shape[0]
        if lvl == levels:
            rl = mat_refs[2 * levels][...]
            vl = mat_refs[2 * levels + 1][...]
            g = _dot_h(rl, hb, prec, dn)
            ir = jax.lax.broadcasted_iota(jnp.int32, (nn, 1, 1), 0)
            g = scale(g, kmul * ((ir + 1) // 2))
            return _dot_h(vl, g, prec, dn)
        n2 = nn // 2
        e = hb[:n2] + hb[n2:]
        o = hb[:n2] - hb[n2:]
        go = _dot_h(mat_refs[2 * lvl][...], o, prec, dn)
        ir = jax.lax.broadcasted_iota(jnp.int32, (n2, 1, 1), 0)
        go = scale(go, kmul * (2 * (ir // 2) + 1))
        qo = _dot_h(mat_refs[2 * lvl + 1][...], go, prec, dn)
        qe = 0.5 * solve(e, lvl + 1, 2 * kmul)
        return jnp.concatenate([qe + qo, qe - qo], axis=0)

    out_ref[...] = solve(h_ref[...], 0, 1)


def _passB_kernel(h_ref, vinvx_ref, vx_ref, out_ref,
                  *, by, n, prec, eps, dxs, vol):
    j = pl.program_id(0)
    _passB_body(h_ref, vinvx_ref, vx_ref, out_ref, j * by,
                by=by, n=n, prec=prec, eps=eps, dxs=dxs, vol=vol)


def _passB_yoff_kernel(yoff_smem, h_ref, vinvx_ref, vx_ref, out_ref,
                       *, by, n, prec, eps, dxs, vol):
    """Sharded-y pass B: the block's global y offset is the traced shard
    offset (SMEM) plus the grid position."""
    j = pl.program_id(0)
    _passB_body(h_ref, vinvx_ref, vx_ref, out_ref, j * by + yoff_smem[0],
                by=by, n=n, prec=prec, eps=eps, dxs=dxs, vol=vol)


def _passB_fold_kernel(h_ref, *args, by, n, prec, eps, dxs, vol, levels):
    mat_refs = args[:-1]
    out_ref = args[-1]
    j = pl.program_id(0)
    _passB_fold_body(h_ref, mat_refs, out_ref, j * by,
                     by=by, n=n, prec=prec, eps=eps, dxs=dxs, vol=vol,
                     levels=levels)


def _passB_fold_yoff_kernel(yoff_smem, h_ref, *args,
                            by, n, prec, eps, dxs, vol, levels):
    mat_refs = args[:-1]
    out_ref = args[-1]
    j = pl.program_id(0)
    _passB_fold_body(h_ref, mat_refs, out_ref, j * by + yoff_smem[0],
                     by=by, n=n, prec=prec, eps=eps, dxs=dxs, vol=vol,
                     levels=levels)


def _passC_kernel(h_ref, vy_ref, vzT_ref, out_ref, *, bx, n, prec):
    t = [_dot_h(vy_ref[...], h_ref[xi], prec) for xi in range(bx)]
    t = jnp.stack(t).reshape(bx * n, n)
    out_ref[...] = _dot_h(t, vzT_ref[...], prec).reshape(bx, n, n)


def poisson_eigen_consts(Np, dxs, dtype):
    """(V, Vinv, eps) for the cube fast-diagonalization solve.  The 3-D
    eigenvalue denominator is generated inside pass B from its closed
    form (see `_passB_kernel`); `eps` is the nullspace pin threshold.
    The k=0 mode (den == 0) maps to zero."""
    V, Vinv, _ = fourier_eigenbasis(Np[0], dxs[0])
    vol = float(np.prod(dxs))
    maxden = 0.0
    for d in range(3):
        _, _, lam_d = fourier_eigenbasis(Np[d], dxs[d])
        maxden += np.max(np.abs(lam_d)) * vol
    eps = float(1e-12 * maxden)
    c = lambda a: jnp.asarray(a, dtype)
    return c(V), c(Vinv), eps


def fold_levels_default(n):
    """Recursion depth for the folded pass B: keep the leaf transform
    >= 128 wide (MXU lane width) in production; a single fold
    otherwise.  Every folded size must satisfy n_d % 4 == 0 (the
    Nyquist mode must stay even-frequency for the closed-form
    row->frequency maps)."""
    levels = 0
    n_d = n
    while n_d % 4 == 0 and n_d // 2 >= 128 and levels < 2:
        levels += 1
        n_d //= 2
    if levels == 0 and n % 4 == 0:
        levels = 1
    return levels


def poisson_fold_consts(Np, dxs, dtype, levels=None):
    """(mats, levels, eps) for the radix-2 folded pass B (see
    `_passB_fold_body`): per recursion level the odd-frequency
    row/column selections of the level's x eigenbasis restricted to the
    first half of its domain, then the leaf basis pair.  The EVEN
    half-basis of a level IS the next level's full basis scaled by
    1/sqrt(2), which is what makes the recursion exact.

    ``mats`` = [R_o^0, S_o^0, ..., R_o^{L-1}, S_o^{L-1}, Vinv_L, V_L].
    """
    n = Np[0]
    if levels is None:
        levels = fold_levels_default(n)
    c = lambda a: jnp.asarray(np.ascontiguousarray(a), dtype)
    mats = []
    n_d = n
    for _ in range(levels):
        assert n_d % 4 == 0, (n, levels, n_d)
        V, Vinv, _ = fourier_eigenbasis(n_d, dxs[0])  # float64 numpy
        n2 = n_d // 2
        odd_idx = []
        for k in range(1, n2, 2):
            odd_idx += [2 * k - 1, 2 * k]
        assert len(odd_idx) == n2
        mats += [c(Vinv[odd_idx][:, :n2]), c(V[:n2][:, odd_idx])]
        n_d = n2
    V, Vinv, _ = fourier_eigenbasis(n_d, dxs[0])
    mats += [c(Vinv), c(V)]
    vol = float(np.prod(dxs))
    maxden = 0.0
    for d in range(3):
        _, _, lam_d = fourier_eigenbasis(Np[d], dxs[d])
        maxden += np.max(np.abs(lam_d)) * vol
    eps = float(1e-12 * maxden)
    return mats, levels, eps


def make_poisson_pallas(Np, dxs, dtype, *, precision="manualhigh",
                        bx=8, by=8, interpret=False, fold_levels=None):
    """Build `solve(f) -> p` (volume-scaled Laplacian, zero-mean pinned),
    equivalent to ops/dft.py `make_poisson_mm` but in 3 Pallas HBM passes.
    """
    # cube required; the %128 lane gate in `poisson_pallas_supported` is a
    # production dispatch criterion (full-dim blocks are legal at any n,
    # which small interpret-mode tests rely on)
    assert len(Np) == 3 and Np[0] == Np[1] == Np[2], Np
    n = Np[0]
    while n % bx != 0:
        bx //= 2
    while n % by != 0:
        by //= 2
    V, Vinv, eps = poisson_eigen_consts(Np, dxs, dtype)
    vol = float(np.prod(dxs))
    prec = None if precision == "manualhigh" else lax.Precision.HIGHEST
    mm = pl.BlockSpec(memory_space=pltpu.VMEM)

    passA = pl.pallas_call(
        functools.partial(_passA_kernel, bx=bx, n=n, prec=prec),
        grid=(n // bx,),
        in_specs=[
            pl.BlockSpec((bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            mm,
            mm,
        ],
        out_specs=pl.BlockSpec(
            (bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )
    fold = n % 4 == 0
    if fold:
        mats, levels, _ = poisson_fold_consts(Np, dxs, dtype,
                                              levels=fold_levels)
        passB_raw = pl.pallas_call(
            functools.partial(
                _passB_fold_kernel, by=by, n=n, prec=prec, eps=eps,
                dxs=tuple(map(float, dxs)), vol=vol, levels=levels,
            ),
            grid=(n // by,),
            in_specs=[
                pl.BlockSpec((n, by, n), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ] + [mm] * len(mats),
            out_specs=pl.BlockSpec(
                (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )
        passB = lambda h, _vi, _v: passB_raw(h, *mats)
    else:
        passB = pl.pallas_call(
            functools.partial(
                _passB_kernel, by=by, n=n, prec=prec, eps=eps,
                dxs=tuple(map(float, dxs)), vol=vol,
            ),
            grid=(n // by,),
            in_specs=[
                pl.BlockSpec((n, by, n), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM),
                mm,
                mm,
            ],
            out_specs=pl.BlockSpec(
                (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )
    passC = pl.pallas_call(
        functools.partial(_passC_kernel, bx=bx, n=n, prec=prec),
        grid=(n // bx,),
        in_specs=[
            pl.BlockSpec((bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            mm,
            mm,
        ],
        out_specs=pl.BlockSpec(
            (bx, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )

    VinvT = jnp.asarray(np.asarray(Vinv).T, dtype)
    VT = jnp.asarray(np.asarray(V).T, dtype)

    def solve(f):
        h = passA(f, Vinv, VinvT)
        h = passB(h, Vinv, V)
        return passC(h, V, VT)

    return solve


def make_fused_projection(Np, dxs, dtype, *, precision="manualhigh", by=8,
                          interpret=False):
    """Pieces for the fully-fused pressure projection: the stage kernel
    emits divhat (z/y-forward fused in, `momentum_stage_divhat_3d`), pass
    B here solves in x, and `pressure_correct_qhat_3d` consumes qhat
    (z/y-inverse fused in) — so the whole Poisson solve costs ONE
    standalone HBM pass.

    Returns dict with `passB(h) -> qhat` and the transform matrices
    (Vinv, VinvT, V, VT) the fused stage kernels take as inputs."""
    assert len(Np) == 3 and Np[0] == Np[1] == Np[2], Np
    n = Np[0]
    while n % by != 0:
        by //= 2
    V, Vinv, eps = poisson_eigen_consts(Np, dxs, dtype)
    vol = float(np.prod(dxs))
    prec = None if precision == "manualhigh" else lax.Precision.HIGHEST
    mm = pl.BlockSpec(memory_space=pltpu.VMEM)
    fold = n % 4 == 0
    if fold:
        mats, levels, _ = poisson_fold_consts(Np, dxs, dtype)
        passB_raw = pl.pallas_call(
            functools.partial(
                _passB_fold_kernel, by=by, n=n, prec=prec, eps=eps,
                dxs=tuple(map(float, dxs)), vol=vol, levels=levels,
            ),
            grid=(n // by,),
            in_specs=[
                pl.BlockSpec((n, by, n), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ] + [mm] * len(mats),
            out_specs=pl.BlockSpec(
                (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )
        passB_fn = lambda h: passB_raw(h, *mats)
    else:
        passB = pl.pallas_call(
            functools.partial(
                _passB_kernel, by=by, n=n, prec=prec, eps=eps,
                dxs=tuple(map(float, dxs)), vol=vol,
            ),
            grid=(n // by,),
            in_specs=[
                pl.BlockSpec((n, by, n), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM),
                mm,
                mm,
            ],
            out_specs=pl.BlockSpec(
                (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )
        passB_fn = lambda h: passB(h, Vinv, V)
    return {
        "passB": passB_fn,
        "Vinv": Vinv,
        "VinvT": jnp.asarray(np.asarray(Vinv).T, dtype),
        "V": V,
        "VT": jnp.asarray(np.asarray(V).T, dtype),
    }


def make_passB_sharded(Np, dxs, dtype, ly, *, precision="manualhigh", by=8,
                       interpret=False):
    """Pass B for an x-slab-sharded fused projection (`parallel/halo.py`):
    after an all_to_all x<->y transpose each shard holds a
    (n, ly, n) y-slice of divhat with FULL x, so the x-forward /
    eigen-scale / x-inverse runs shard-locally — only the y index offset
    of the eigenvalue denominator depends on the shard, passed traced
    (`yoff`, typically ``axis_index('x') * ly``).

    Returns dict: `passB(h_local, yoff) -> qhat_local` plus the z/y
    transform matrices for the fused stage/correction kernels."""
    assert len(Np) == 3 and Np[0] == Np[1] == Np[2], Np
    n = Np[0]
    while ly % by != 0:
        by //= 2
    V, Vinv, eps = poisson_eigen_consts(Np, dxs, dtype)
    vol = float(np.prod(dxs))
    prec = None if precision == "manualhigh" else lax.Precision.HIGHEST
    mm = pl.BlockSpec(memory_space=pltpu.VMEM)
    fold = n % 4 == 0
    if fold:
        # the fold acts on the x axis, which is FULL (unsharded) after
        # the all_to_all transpose — only the y eigen-offset is sharded
        mats, levels, _ = poisson_fold_consts(Np, dxs, dtype)
        passB = pl.pallas_call(
            functools.partial(
                _passB_fold_yoff_kernel, by=by, n=n, prec=prec, eps=eps,
                dxs=tuple(map(float, dxs)), vol=vol, levels=levels,
            ),
            grid=(ly // by,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n, by, n), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ] + [mm] * len(mats),
            out_specs=pl.BlockSpec(
                (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, ly, n), dtype),
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )

        def solve(h_local, yoff):
            yoff_arr = jnp.reshape(yoff, (1,)).astype(jnp.int32)
            return passB(yoff_arr, h_local, *mats)

        return {
            "passB": solve,
            "Vinv": Vinv,
            "VinvT": jnp.asarray(np.asarray(Vinv).T, dtype),
            "V": V,
            "VT": jnp.asarray(np.asarray(V).T, dtype),
        }
    passB = pl.pallas_call(
        functools.partial(
            _passB_yoff_kernel, by=by, n=n, prec=prec, eps=eps,
            dxs=tuple(map(float, dxs)), vol=vol,
        ),
        grid=(ly // by,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            mm,
            mm,
        ],
        out_specs=pl.BlockSpec(
            (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, ly, n), dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )

    def solve(h_local, yoff):
        yoff_arr = jnp.reshape(yoff, (1,)).astype(jnp.int32)
        return passB(yoff_arr, h_local, Vinv, V)

    return {
        "passB": solve,
        "Vinv": Vinv,
        "VinvT": jnp.asarray(np.asarray(Vinv).T, dtype),
        "V": V,
        "VT": jnp.asarray(np.asarray(V).T, dtype),
    }
