"""Pallas TPU conv kernels for the small-channel closure stack.

Why XLA's conv is slow here: the closure CNN (reference
lib/NeuralClosure/src/cnn.jl:5-48; channels 3..24) leaves the MXU's
128-wide contraction dim nearly empty, and XLA's im2col conv measured
7.15 TFLOP/s even tap-folded (benchmarks/conv_probe.py).  The
N = Cout = 24 output-lane fill caps ANY matmul formulation at
~200*24/128 = 37 TFLOP/s on v5e; this kernel approaches that cap by
removing all data rearrangement from the inner loop:

**Tap-matmul formulation.** Fold the z (minor spatial) kernel taps into
the channel dim in XLA (one concat of k z-shifted slices -> kc = k*Cin
channels, lane-dense).  The remaining (dx, dy) taps become PURE ROW
OFFSETS of the collapsed ((y, z), kc) plane view: with z minor-adjacent
to the channels, a y-shift is a row offset of nz (sublane-tile aligned
for nz % 16 == 0) and an x-shift selects a neighbouring plane.  So

    out[y, z, :] = sum_{dx, dy}  G[x+dx] [(y+dy)*nz + z, :] @ W2[dx, dy]

is kx*ky MXU dots per output plane on aligned VMEM slices — no im2col
copies, no patch materialization, nothing on the VPU but the f32
accumulate and the fused bias + activation.

The backward pass reuses the same structure: dG is the SAME kernel on a
zero-padded cotangent with flipped/transposed taps (N = kc -> full lane
fill, better than the forward), and dW2 accumulates kx*ky
(M-contraction) dots into a VMEM-resident accumulator across the plane
grid — one pass over G and the cotangent.  tanh' is expressed in the
layer OUTPUT (1 - y^2) so no pre-activation residual is stored.

Alignment contract: Mosaic requires HBM block minors in 128-lane
multiples, so ``kc % 128 == 0`` (callers zero-pad the fold — the pad
fuses into the XLA concat) and outputs carry ``coutp = ceil(cout/128) *
128`` channels, the trailing ``act(0)`` ones sliced off by the caller
(the slice fuses into the next layer's fold).

Planes stream HBM->VMEM through a ring window (one DMA per plane per
pass, double-buffered), as in ops/pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tapconv_3d", "tapconv_wgrad_3d", "make_conv_layer",
           "packconv_3d", "tapconv_supported", "lanes"]


def lanes(c):
    return -(-c // 128) * 128


def tapconv_supported(nyp, nz, kc, cout, kx=5, budget=96 * 1024 * 1024):
    """VMEM feasibility + Mosaic alignment for the tap-matmul kernel."""
    if nz % 128 != 0 or kc % 128 != 0 or cout > 128 or kc > 1024:
        return False
    window = (kx + 1) * nyp * nz * kc * 2  # bf16 ring
    out = 2 * nyp * nz * lanes(cout) * 4  # pipelined out blocks
    acc = 2 * nyp * nz * lanes(max(kc, cout)) * 4  # dot temporaries
    return window + out + acc <= budget


def _yblock(ny, nz, target=4096):
    """Largest y-block whose (yb*nz, kc) matmul M-dim stays near
    ``target`` rows (single tpu.matmul vectors cap out well below a full
    128^2 plane) while dividing ny."""
    yb = max(1, target // nz)
    while ny % yb != 0:
        yb -= 1
    return yb


def _tapconv_kernel(g_hbm, w_ref, b_ref, out_ref, win, sems, *,
                    kx, ky, nx, ny, nz, act, has_bias):
    """One output x-plane per grid step; ring window of kx+1 g-planes."""
    i = pl.program_id(0)
    W = kx + 1

    def load(p, slot):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(p, 1)], win.at[pl.ds(slot, 1)], sems.at[slot]
        )

    @pl.when(i == 0)
    def _():
        for p in range(kx):
            load(p, p % W).start()

    @pl.when(i + 1 < nx)
    def _():
        load(i + kx, (i + kx) % W).start()

    @pl.when(i == 0)
    def _():
        for p in range(kx):
            load(p, p % W).wait()

    @pl.when(i > 0)
    def _():
        load(i + kx - 1, (i + kx - 1) % W).wait()

    kc = win.shape[-1]
    coutp = out_ref.shape[-1]
    yb = _yblock(ny, nz)
    for y0 in range(0, ny, yb):
        acc = jnp.zeros((yb * nz, coutp), jnp.float32)
        for dx in range(kx):
            slot = (i + dx) % W
            for dy in range(ky):
                lhs = win[slot, y0 + dy : y0 + dy + yb].reshape(yb * nz, kc)
                acc += jnp.dot(
                    lhs, w_ref[dx, dy],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
        if has_bias:
            acc += b_ref[0].astype(jnp.float32)
        if act is not None:
            acc = act(acc)
        out_ref[0, y0 : y0 + yb] = acc.reshape(yb, nz, coutp).astype(
            out_ref.dtype
        )


def tapconv_3d(g, w2, bias=None, act=None, *, out_dtype=None, interpret=False):
    """Tap-matmul conv: ``out[x,y,z,:] = act(sum_{dx,dy} g[x+dx, y+dy, z, :]
    @ w2[dx,dy] + bias)``.

    g: (nxp, nyp, nz, kc) with kc % 128 == 0 — z-taps pre-folded into kc
    (zero-padded to the lane tile), x/y pre-padded by kx-1 / ky-1 total.
    w2: (kx, ky, kc, cout).  bias: (cout,) or None.  act: traceable
    elementwise fn or None.  Returns (nxp-kx+1, nyp-ky+1, nz, coutp)
    with coutp = lanes(cout); trailing channels are act(0).
    """
    nxp, nyp, nz, kc = g.shape
    kx, ky, kc2, cout = w2.shape
    assert kc2 == kc and kc % 128 == 0, (kc2, kc)
    assert nz % 128 == 0, nz
    nx, ny = nxp - kx + 1, nyp - ky + 1
    assert nx >= 1 and ny >= 1
    out_dtype = out_dtype or g.dtype
    coutp = lanes(cout)
    if coutp != cout:
        w2 = jnp.pad(w2, ((0, 0),) * 3 + ((0, coutp - cout),))
        if bias is not None:
            bias = jnp.pad(bias, (0, coutp - cout))
    has_bias = bias is not None
    kernel = functools.partial(
        _tapconv_kernel, kx=kx, ky=ky, nx=nx, ny=ny, nz=nz, act=act,
        has_bias=has_bias,
    )
    if not has_bias:
        inner = kernel

        def kernel(g_hbm, w_ref, out_ref, win, sems):
            return inner(g_hbm, w_ref, None, out_ref, win, sems)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((kx, ky, kc, coutp), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g, w2.astype(g.dtype)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, coutp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, coutp).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ny, nz, coutp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, coutp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kx + 1, nyp, nz, kc), g.dtype),
            pltpu.SemaphoreType.DMA((kx + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _wgrad_kernel(g_hbm, ct_hbm, out_ref, win, ctbuf, sems, ctsems, *,
                  kx, ky, nx, ny, nz):
    i = pl.program_id(0)
    W = kx + 1

    def load(p, slot):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(p, 1)], win.at[pl.ds(slot, 1)], sems.at[slot]
        )

    def load_ct(m, s):
        return pltpu.make_async_copy(
            ct_hbm.at[pl.ds(m, 1)], ctbuf.at[pl.ds(s, 1)], ctsems.at[s]
        )

    @pl.when(i == 0)
    def _():
        for p in range(kx):
            load(p, p % W).start()
        load_ct(0, 0).start()

    @pl.when(i + 1 < nx)
    def _():
        load(i + kx, (i + kx) % W).start()
        load_ct(i + 1, (i + 1) % 2).start()

    @pl.when(i == 0)
    def _():
        for p in range(kx):
            load(p, p % W).wait()

    @pl.when(i > 0)
    def _():
        load(i + kx - 1, (i + kx - 1) % W).wait()
    load_ct(i, i % 2).wait()

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    kc = win.shape[-1]
    coutp = out_ref.shape[-1]
    yb = _yblock(ny, nz)
    dn = (((0,), (0,)), ((), ()))
    for dx in range(kx):
        slot = (i + dx) % W
        for dy in range(ky):
            acc = jnp.zeros((kc, coutp), jnp.float32)
            for y0 in range(0, ny, yb):
                lhs = win[slot, y0 + dy : y0 + dy + yb].reshape(yb * nz, kc)
                ct = ctbuf[i % 2, y0 : y0 + yb].reshape(yb * nz, coutp)
                acc += jax.lax.dot_general(
                    lhs, ct, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            out_ref[dx, dy] += acc


def tapconv_wgrad_3d(g, ct, kx, ky, *, interpret=False):
    """dW2[dx,dy] = sum_x G[x+dx, dy:dy+ny]^T @ ct[x] — one pass over g
    and ct, VMEM-resident (kx, ky, kc, coutp) f32 accumulator.
    ct must carry lane-padded channels (coutp % 128 == 0)."""
    nxp, nyp, nz, kc = g.shape
    nx, ny, nz2, coutp = ct.shape
    assert nz2 == nz and nx == nxp - kx + 1 and ny == nyp - ky + 1
    assert coutp % 128 == 0 and kc % 128 == 0
    kernel = functools.partial(
        _wgrad_kernel, kx=kx, ky=ky, nx=nx, ny=ny, nz=nz
    )
    return pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((kx, ky, kc, coutp), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kx, ky, kc, coutp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kx + 1, nyp, nz, kc), g.dtype),
            pltpu.VMEM((2, ny, nz, coutp), ct.dtype),
            pltpu.SemaphoreType.DMA((kx + 1,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(g, ct.astype(g.dtype))


# ---------------------------------------------------------------------------
# Differentiable layer: linear conv + bias + activation under custom_vjp
# ---------------------------------------------------------------------------

_ACTS = {
    "id": (None, lambda y, ct: ct),
    "tanh": (jnp.tanh, lambda y, ct: ct * (1.0 - y * y)),
}


def make_conv_layer(actname, has_bias, *, interpret=False, pack=None):
    """Build ``layer(g, w2, bias) -> act(conv(g, w2) + bias)`` with a
    Pallas forward AND backward (custom VJP).

    Forward: pack-tile kernel when the taps fit next to cout in a
    128-lane tile (``ky*cout <= 128``; ~94% useful MXU lanes), else the
    tap-matmul kernel; override with ``pack=True/False``.  Backward: dG
    is the tap-matmul kernel on the zero-padded cotangent with
    flipped/transposed taps (N = kc -> full lane fill), dW a one-pass
    M-contraction accumulator kernel; tanh' is expressed in the layer
    OUTPUT (1 - y^2) so no pre-activation residual is stored.

    ``bias`` must be a (cout,) array (pass zeros when has_bias=False —
    its cotangent is then zero).  ``actname``: 'id' | 'tanh'.  Returns
    the lane-padded output (see tapconv_3d).
    """
    act, dact = _ACTS[actname]

    def _forward(g, w2, bias):
        ky, cout = w2.shape[1], w2.shape[3]
        usepack = pack if pack is not None else (ky * cout <= 128)
        fn = packconv_3d if usepack else tapconv_3d
        return fn(g, w2, bias if has_bias else None, act,
                  out_dtype=g.dtype, interpret=interpret)

    @jax.custom_vjp
    def layer(g, w2, bias):
        return _forward(g, w2, bias)

    def _layer_fwd(g, w2, bias):
        y = _forward(g, w2, bias)
        return y, (g, w2, y)

    def _layer_bwd(res, ct):
        g, w2, y = res
        kx, ky, kc, cout = w2.shape
        coutp = lanes(cout)
        dpre32 = dact(y.astype(jnp.float32), ct.astype(jnp.float32))
        dpre = dpre32.astype(g.dtype)
        dw = tapconv_wgrad_3d(g, dpre, kx, ky, interpret=interpret)[
            ..., :cout].astype(w2.dtype)
        db = (jnp.sum(dpre32[..., :cout], axis=(0, 1, 2)).astype(w2.dtype)
              if has_bias else jnp.zeros((cout,), w2.dtype))
        # full correlation:
        #   dg[xp,yp] = sum_{dx,dy} dpre[xp-dx, yp-dy] @ w2[dx,dy]^T
        ctp = jnp.pad(
            dpre, ((kx - 1, kx - 1), (ky - 1, ky - 1), (0, 0), (0, 0))
        )
        # (kx, ky, coutp, kc): flipped taps, transposed channels, rows pad
        wback = jnp.flip(jnp.flip(w2, 0), 1).swapaxes(2, 3)
        wback = jnp.pad(wback,
                        ((0, 0), (0, 0), (0, coutp - cout), (0, 0)))
        dg = tapconv_3d(ctp, wback, None, None, out_dtype=g.dtype,
                        interpret=interpret)[..., :kc]
        return dg, dw, db

    layer.defvjp(_layer_fwd, _layer_bwd)
    return layer


# ---------------------------------------------------------------------------
# Pack-tile formulation: the fast path.
#
# The tap-matmul kernel above is RAW-MXU-roofline-bound: every (dx, dy)
# tap is a full 128-lane MXU pass of which only cout lanes are useful
# (measured ~13 ms for the 24-channel layer at 128^3 — exactly the raw
# pass count times the calibrated ~110 TFLOP/s pallas dot rate).  The
# pack-tile kernel removes the waste: per INPUT plane compute once
#
#     G[m, (dy, co)] = sum_kc g[m, kc] * w2[dx, dy, kc, co]      (tile dx)
#
# i.e. one (M, kc) @ (kc, ntile*128) dot whose N dim packs ky*cout
# (<= 128) tap-results per tile — ~94% useful lanes.  The tap combine is
# then pure VPU: for each (dx, dy), a STATIC row-slice of the ring-held
# G plane xo+dx (dy -> row offset dy*nz) lane-rolled left by dy*cout and
# accumulated.  Raw MXU work drops ky-fold (or kx*ky-fold when all taps
# pack, e.g. cout=3); the rolls/adds overlap the MXU.
#
# G planes live in a VMEM ring (kx slots) per y-strip; the grid is
# (nstrip, nx) with x innermost so each G plane is computed once per
# strip (strips overlap ky-1 rows of recompute).
# ---------------------------------------------------------------------------


def _pack_plan(kx, ky, cout):
    """How many tap dims fit in a 128-lane tile next to cout.

    Returns (pack_dx, lanes_per_tile): pack_dx=True packs (dx, dy, co)
    into one tile (no plane-tiles), else tiles are per-dx with (dy, co)
    packed.  Requires ky*cout <= 128."""
    if kx * ky * cout <= 128:
        return True, kx * ky * cout
    assert ky * cout <= 128, (ky, cout)
    return False, ky * cout


def _packconv_kernel(g_hbm, w_ref, r_ref, b_ref, out_ref, gbuf, gring,
                     sems, *, kx, ky, nx, nys, nz, cout, pack_dx, act,
                     has_bias, nstrip):
    i = pl.program_id(1)  # x plane (inner)
    # program_id must bind at kernel top level (the interpreter cannot
    # substitute it inside a pl.when body's cond jaxpr)
    s = pl.program_id(0)  # y strip (outer)
    ntile = 1 if pack_dx else kx
    R = kx  # G ring slots

    def load(p, slot):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(p, 1), pl.ds(s * nys, nys + ky - 1)],
            gbuf.at[pl.ds(slot, 1)],
            sems.at[slot],
        )

    def compute_g(p, slot):
        """G[p] = gplane @ Ws (one N=128 dot per tile) into ring p % R."""
        mrows = (nys + ky - 1) * nz
        kc = gbuf.shape[-1]
        gv = gbuf[slot].reshape(mrows, kc)
        for tile in range(ntile):
            gg = jnp.dot(
                gv, w_ref[:, tile],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            gring[p % R, tile] = gg.astype(gring.dtype)

    nplanes = nx + kx - 1  # per strip

    # x is innermost: at i == 0 (each strip) fill the pipeline.
    @pl.when(i == 0)
    def _():
        load(0, 0).start()
        for p in range(kx):
            if p + 1 < nplanes:
                load(p + 1, (p + 1) % 2).start()
            load(p, p % 2).wait()
            compute_g(p, p % 2)
        # ring holds G[0..kx-1]; DMA for plane kx in flight

    # (top-level whens only: the interpreter cannot substitute
    # program_id inside a when nested in another when)
    @pl.when((i > 0) & (i + 1 < nx))
    def _():
        load(i + kx, (i + kx) % 2).start()

    @pl.when(i > 0)
    def _():
        p = i + kx - 1
        load(p, p % 2).wait()
        compute_g(p, p % 2)

    # Combine taps from the ring.  Each tap (dx, dy) lives in lanes
    # [t*cout, (t+1)*cout) of its tile and must be read at row offset
    # dy*nz: accumulate lane-MASKED row-slices (no rotate ops), then
    # collapse the packed lane blocks with one tiny block-sum matmul
    # (r_ref[t*cout+co, co] = 1) — MXU, exact in f32-HIGHEST.
    m_out = nys * nz
    lane = jax.lax.broadcasted_iota(jnp.int32, (m_out, 128), 1)
    acc = jnp.zeros((m_out, 128), jnp.float32)
    for dx in range(kx):
        tile = 0 if pack_dx else dx
        slot = (i + dx) % R
        for dy in range(ky):
            v = gring[slot, tile, dy * nz : dy * nz + m_out]
            t = (dx * ky + dy) if pack_dx else dy
            if (kx * ky if pack_dx else ky) > 1:
                keep = (lane >= t * cout) & (lane < (t + 1) * cout)
                acc += jnp.where(keep, v.astype(jnp.float32), 0.0)
            else:
                acc += v.astype(jnp.float32)
    acc = jnp.dot(acc, r_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if has_bias:
        acc += b_ref[0].astype(jnp.float32)
    if act is not None:
        acc = act(acc)
    out_ref[0] = acc.reshape(nys, nz, 128).astype(out_ref.dtype)


def packconv_3d(g, w2, bias=None, act=None, *, out_dtype=None, nys=None,
                interpret=False):
    """Pack-tile conv, same contract as tapconv_3d (g: (nxp, nyp, nz, kc)
    kc%128==0; returns (nx, ny, nz, 128), trailing lanes act(0)).
    Requires ky*cout <= 128 and ny % nys == 0."""
    nxp, nyp, nz, kc = g.shape
    kx, ky, kc2, cout = w2.shape
    assert kc2 == kc and kc % 128 == 0 and nz % 128 == 0
    nx, ny = nxp - kx + 1, nyp - ky + 1
    pack_dx, lpt = _pack_plan(kx, ky, cout)
    ntile = 1 if pack_dx else kx
    out_dtype = out_dtype or g.dtype
    if nys is None:
        # strip height: f32 G ring kx*(nys+ky-1)*nz*ntile*128*4 <= ~60MB
        nys = ny
        while kx * (nys + ky - 1) * nz * ntile * 128 * 4 > 60 * 1024 * 1024:
            nys //= 2
    assert ny % nys == 0
    nstrip = ny // nys
    # Ws[kc, tile, (t_packed, co)]: tile=dx (or single tile, t=(dx,dy))
    ws = jnp.zeros((kc, ntile, 128), w2.dtype)
    for dx in range(kx):
        for dy in range(ky):
            tile = 0 if pack_dx else dx
            t = (dx * ky + dy) if pack_dx else dy
            ws = ws.at[:, tile, t * cout : (t + 1) * cout].set(w2[dx, dy])
    kernel = functools.partial(
        _packconv_kernel, kx=kx, ky=ky, nx=nx, nys=nys, nz=nz, cout=cout,
        pack_dx=pack_dx, act=act, has_bias=bias is not None, nstrip=nstrip,
    )
    if bias is None:
        inner = kernel

        def kernel(g_hbm, w_ref, r_ref, out_ref, gbuf, gring, sems):
            return inner(g_hbm, w_ref, r_ref, None, out_ref, gbuf, gring,
                         sems)

    npack = kx * ky if pack_dx else ky
    rsum = jnp.zeros((128, 128), jnp.float32)
    for t in range(npack):
        rsum = rsum.at[t * cout : (t + 1) * cout, :cout].set(
            jnp.eye(cout, dtype=jnp.float32))
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((kc, ntile, 128), lambda s, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), lambda s, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g, ws.astype(g.dtype), rsum]
    if bias is not None:
        bp = jnp.pad(bias, (0, 128 - cout))
        in_specs.append(pl.BlockSpec((1, 128), lambda s, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bp.reshape(1, 128).astype(jnp.float32))
    mrows = (nys + ky - 1) * nz
    return pl.pallas_call(
        kernel,
        grid=(nstrip, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nys, nz, 128), lambda s, i: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, 128), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nys + ky - 1, nz, kc), g.dtype),
            # f32 ring: bf16 tap partials measured 5e-2 abs error on
            # tanh-scale outputs (25 quantized partials); f32 restores
            # tapconv-exact accumulation at half the strip height
            pltpu.VMEM((kx, ntile, mrows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Fused-fold conv: the production formulation.
#
# The tap-matmul and pack-tile kernels above require the z-taps folded
# into channels by an XLA-side concat — measured 15.6 ms/layer at 128^3
# (5x re-read of the input at lane-misaligned 24-channel strides), more
# than the conv kernels themselves.  The fused kernel removes ALL host-
# graph glue: the input is the plain lane-padded field (nx, ny, nz, cp),
# periodic pads ride the DMA (modular plane/row offsets), and the z-fold
# happens in VMEM (kz static sub-lane copies per plane).
#
# Weight packing (the MXU trick): tiles are indexed by dy, each packing
# (dx, cout) into the 128-lane output dim:
#
#     Ws[(dz, c), dy, dx*cout + o] = w[dx, dy, dz, c, o]
#
# Per input plane p, ONE row-sliced dot per dy accumulates
#
#     H_p = sum_dy win_p[dy : dy + nys] @ Ws[:, dy]          (f32)
#
# whose lane block dx is plane p's total contribution to output plane
# p - dx + rx.  The combine is then kx lane-rolls + adds from the H ring
# (no masks, no collapse matmul):
#
#     out_i[:, 0:cout] = sum_dx roll(H_{i+dx-rx}, -dx*cout)[:, 0:cout]
#
# Raw MXU work is ky row-sliced (m, kc)@(kc, 128) dots per plane —
# kc*128/(k^2*cin*cout) = 1.14x the useful FLOPs for the closure's
# 24-channel layers (vs 5.7x for tap-matmul, ~9x for XLA's conv).
#
# The structure is self-adjoint: dL/dh is the SAME kernel on the masked
# cotangent with flipped/transposed taps (kx*cin <= 128 packs too), and
# dL/dWs accumulates the SAME ky dots per plane against dH_p (built by
# kx lane-rolls of the cotangent ring) — fwd, dh and dW all run within
# 1.14x of the useful FLOPs.
#
# Contract: output lanes >= cout are GARBAGE (callers slice); input
# lanes >= cin are ignored.  nz % 16 == 0 (sublane tile), kx*cout <= 128,
# lanes(kz*cin) <= 1024.  x, y, z are all periodic (wrap) — the chunked
# x-halo path stays on the XLA fold.
# ---------------------------------------------------------------------------


def fused_supported(ny, nz, cin, cout, k, budget=96 * 1024 * 1024):
    """Shape/VMEM gate for fusedconv_3d (and its backward twins, which
    swap cin/cout — checked both ways)."""
    if nz % 16 != 0 or nz < k or ny < k:
        return False
    for ci, co in ((cin, cout), (cout, cin)):
        if k * co > 128 or lanes(k * ci) > 1024:
            return False
        if _pick_nys(ny, nz, lanes(k * ci), k, budget=budget) is None:
            return False
    return True


def _pick_nys(ny, nz, kc, k, *, itemsize=2, budget=96 * 1024 * 1024):
    """Largest divisor of ny <= 32 whose strip fits the VMEM budget.

    The cap is measured, not a footprint bound: at 128^3 / C=24 the
    kernel runs 9.1 ms at nys=32 vs 15.0 at nys=64 (worse VMEM
    locality), and Mosaic compile time grows superlinearly in the strip
    height (12 s -> 93 s per layer going 32 -> 64 — the 5-stage unroll
    in `compute_H`'s windows scales with nys).  nys=32 already gives
    the dy-dots 4096 rows at nz=128, far past MXU amortization."""
    def fits(nys):
        gbuf = 2 * (nys + k - 1) * (nz + 2 * _ZP) * 128 * itemsize
        win = (nys + k - 1) * nz * kc * itemsize
        hring = k * nys * nz * 128 * 4
        out = 2 * nys * nz * 128 * 4
        dpre = k * nys * nz * 128 * itemsize  # wgrad ct ring
        return gbuf + win + hring + out + dpre <= budget

    for nys in range(min(ny, 32), 0, -1):
        if ny % nys == 0 and fits(nys):
            return nys
    return None


def _fused_dma_plans(h_hbm, gbuf, sems, *, s, nys, ny, nz, ry, rz, nsrc):
    """DMA plan factory: plane j -> z/y-wrap-padded gbuf slot.

    y rows [s*nys - ry, s*nys + nys + ry) and z rows [-rz, nz + rz) are
    decomposed into static-size parts with modular (traced) offsets, so
    one plan covers interior and wrap strips alike (no part ever
    straddles: the main block is strip-aligned and the halo parts are
    ry < nys rows).  z is the sublane-tiled dim, so its halo is padded
    to ZP = 8 rows (DMA offsets/sizes must be 8-row aligned; the fold
    reads at the true rz offset inside the over-fetched halo)."""
    yparts = [(nys, s * nys, ry)]
    if ry > 0:
        yparts += [(ry, (s * nys - ry) % ny, 0),
                   (ry, (s * nys + nys) % ny, nys + ry)]
    zp = _ZP if rz > 0 else 0
    zparts = [(nz, 0, zp)]
    if rz > 0:
        zparts += [(zp, nz - zp, 0), (zp, 0, nz + zp)]

    def plans(j, slot):
        src = j % nsrc
        cps = []
        q = 0
        for ylen, ysrc, ydst in yparts:
            if ylen == 0:
                continue
            for zlen, zsrc, zdst in zparts:
                cps.append(pltpu.make_async_copy(
                    h_hbm.at[pl.ds(src, 1), pl.ds(ysrc, ylen),
                             pl.ds(zsrc, zlen)],
                    gbuf.at[pl.ds(slot, 1), pl.ds(ydst, ylen),
                            pl.ds(zdst, zlen)],
                    sems.at[slot, q],
                ))
                q += 1
        return cps

    return plans


_ZP = 8  # z-halo DMA padding (sublane tile)


def _fold_win(gbuf, slot, win, *, kz, cin, nz):
    """VMEM z-fold: win[:, :, dz*cin + c] = gbuf[slot][:, zoff+dz+z, c].
    Tail lanes (>= kz*cin) are zeroed — the dots contract all kc lanes
    against zero weight rows, and uninitialized VMEM may hold NaNs."""
    rz = kz // 2
    zoff = (_ZP - rz) if rz > 0 else 0
    if kz * cin < win.shape[-1]:
        win[:, :, kz * cin :] = jnp.zeros(
            (*win.shape[:2], win.shape[-1] - kz * cin), win.dtype
        )
    for dz in range(kz):
        win[:, :, dz * cin : (dz + 1) * cin] = gbuf[
            slot, :, zoff + dz : zoff + dz + nz, :cin
        ]


def _fusedconv_kernel(h_hbm, w_ref, b_ref, out_ref, gbuf, win, hring,
                      sems, *, kx, ky, kz, cin, cout, nx, nys, ny, nz,
                      act, has_bias):
    i = pl.program_id(1)  # output x plane (inner)
    s = pl.program_id(0)  # y strip
    rx, ry, rz = kx // 2, ky // 2, kz // 2
    m_out = nys * nz
    kc = win.shape[-1]

    plans = _fused_dma_plans(
        h_hbm, gbuf, sems, s=s, nys=nys, ny=ny, nz=nz, ry=ry, rz=rz,
        nsrc=nx,
    )

    def compute_H(j, slot):
        _fold_win(gbuf, slot, win, kz=kz, cin=cin, nz=nz)
        acc = jnp.zeros((m_out, 128), jnp.float32)
        for dy in range(ky):
            lhs = win[dy : dy + nys].reshape(m_out, kc)
            acc = acc + jnp.dot(
                lhs, w_ref[:, dy],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        hring[j % kx] = acc

    # pipeline: j indexes H planes (source plane (i + dx - rx) % nx at
    # j = i + dx); at i == 0 fill H_0..H_{kx-1}, then one new plane per i
    @pl.when(i == 0)
    def _():
        plan0 = plans(0 - rx, 0)
        for cp in plan0:
            cp.start()
        for j in range(kx):
            if j + 1 < nx + kx - 1:
                for cp in plans(j + 1 - rx, (j + 1) % 2):
                    cp.start()
            for cp in plans(j - rx, j % 2):
                cp.wait()
            compute_H(j, j % 2)

    @pl.when((i > 0) & (i + 1 < nx))
    def _():
        for cp in plans(i + kx - rx, (i + kx) % 2):
            cp.start()

    @pl.when(i > 0)
    def _():
        j = i + kx - 1
        for cp in plans(j - rx, j % 2):
            cp.wait()
        compute_H(j, j % 2)

    # combine: out_i = sum_dx roll_left(H_{i+dx}, dx*cout)
    acc = hring[i % kx][...]
    for dx in range(1, kx):
        v = hring[(i + dx) % kx][...]
        acc = acc + pltpu.roll(v, 128 - dx * cout, axis=1)
    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    if act is not None:
        acc = act(acc)
    out_ref[0] = acc.reshape(nys, nz, 128).astype(out_ref.dtype)


def pack_ws(w, dtype):
    """Canonical (kx, ky, kz, cin, cout) weights -> the fused kernel's
    (lanes(kz*cin), ky, 128) tile layout (see module comment)."""
    kx, ky, kz, cin, cout = w.shape
    kc = lanes(kz * cin)
    ws = jnp.zeros((kc, ky, 128), dtype)
    # rows (dz, c) packed; lanes (dx, o) packed
    wt = w.transpose(1, 2, 3, 0, 4).reshape(ky, kz * cin, kx * cout)
    ws = ws.at[: kz * cin, :, : kx * cout].set(
        wt.transpose(1, 0, 2).astype(dtype)
    )
    return ws


def pack_ws_back(w, dtype):
    """Flipped/transposed packing for the input-gradient pass: the
    cotangent (channels o) convolves with w[kx-1-dx', ky-1-dy',
    kz-1-dz', c, o] producing channels c."""
    wb = jnp.flip(jnp.flip(jnp.flip(w, 0), 1), 2).transpose(0, 1, 2, 4, 3)
    return pack_ws(wb, dtype)


def unpack_dws(dws, kx, ky, kz, cin, cout):
    """(kc, ky, 128) weight-gradient -> canonical (kx, ky, kz, cin, cout)."""
    dt = dws[: kz * cin, :, : kx * cout].reshape(kz, cin, ky, kx, cout)
    return dt.transpose(3, 2, 0, 1, 4)


def fusedconv_3d(h, ws, bias=None, act=None, *, cin, cout, k,
                 out_dtype=None, nys=None, interpret=False):
    """Fused-fold periodic conv layer (see module comment).

    h: (nx, ny, nz, cp) with cp >= cin (lanes beyond cin ignored);
    ws: (lanes(k*cin), k, 128) from `pack_ws`.  Returns
    (nx, ny, nz, 128) with lanes >= cout garbage."""
    nx, ny, nz, cp = h.shape
    kc = lanes(k * cin)
    assert ws.shape == (kc, k, 128), (ws.shape, kc, k)
    assert k * cout <= 128 and nz % 16 == 0 and cp % 128 == 0
    out_dtype = out_dtype or h.dtype
    if nys is None:
        nys = _pick_nys(ny, nz, kc, k,
                        itemsize=jnp.dtype(h.dtype).itemsize)
    assert nys is not None and ny % nys == 0 and k // 2 <= nys
    nstrip = ny // nys
    kernel = functools.partial(
        _fusedconv_kernel, kx=k, ky=k, kz=k, cin=cin, cout=cout, nx=nx,
        nys=nys, ny=ny, nz=nz, act=act, has_bias=bias is not None,
    )
    if bias is None:
        inner = kernel

        def kernel(h_hbm, w_ref, out_ref, gbuf, win, hring, sems):
            return inner(h_hbm, w_ref, None, out_ref, gbuf, win, hring,
                         sems)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((kc, k, 128), lambda s, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [h, ws.astype(h.dtype)]
    if bias is not None:
        bp = jnp.pad(bias, (0, 128 - cout))
        in_specs.append(pl.BlockSpec((1, 128), lambda s, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bp.reshape(1, 128).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(nstrip, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nys, nz, 128), lambda s, i: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, 128), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nys + k - 1, nz + (2 * _ZP if k > 1 else 0), cp),
                       h.dtype),
            pltpu.VMEM((nys + k - 1, nz, kc), h.dtype),
            pltpu.VMEM((k, nys * nz, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _fused_wgrad_kernel(h_hbm, ct_hbm, dws_ref, gbuf, win, ctring, sems,
                        ctsems, *, kx, ky, kz, cin, cout, nx, nys, ny,
                        nz):
    """dWs[:, dy] += win_p[dy:dy+nys]^T @ dH_p per input plane p, with
    dH_p = sum_dx roll_right(ct_{p-dx+rx}, dx*cout) built from a ct ring."""
    p = pl.program_id(1)
    s = pl.program_id(0)
    rx, ry, rz = kx // 2, ky // 2, kz // 2
    m_out = nys * nz
    kc = win.shape[-1]

    plans = _fused_dma_plans(
        h_hbm, gbuf, sems, s=s, nys=nys, ny=ny, nz=nz, ry=ry, rz=rz,
        nsrc=nx,
    )

    R = kx + 1  # ct ring: kx live planes + one prefetch slot

    def ct_load(q, slot):
        # ct plane (q % nx), out-layout rows (no halo)
        return pltpu.make_async_copy(
            ct_hbm.at[pl.ds(q % nx, 1), pl.ds(s * nys, nys)],
            ctring.at[pl.ds(slot, 1)],
            ctsems.at[slot],
        )

    # pipeline: at plane p we need h plane p and ct planes p-rx..p+rx
    @pl.when(p == 0)
    def _():
        for cp in plans(0, 0) + plans(1, 1):
            cp.start()
        # initial ct fill: the kx live planes plus one prefetch (waited
        # at p == 1)
        for q in range(-rx, rx + 2 if nx > 1 else rx + 1):
            ct_load(q, q % R).start()

    @pl.when((p > 0) & (p + 1 < nx))
    def _():
        for cp in plans(p + 1, (p + 1) % 2):
            cp.start()

    @pl.when((p > 0) & (p + 1 < nx))
    def _():
        ct_load(p + 1 + rx, (p + 1 + rx) % R).start()

    @pl.when(p == 0)
    def _():
        for q in range(-rx, rx + 1):
            ct_load(q, q % R).wait()
        for cp in plans(0, 0):
            cp.wait()

    @pl.when((p == 0) & (s == 0))
    def _():
        dws_ref[...] = jnp.zeros(dws_ref.shape, dws_ref.dtype)

    @pl.when(p > 0)
    def _():
        ct_load(p + rx, (p + rx) % R).wait()
        for cp in plans(p, p % 2):
            cp.wait()

    _fold_win(gbuf, p % 2, win, kz=kz, cin=cin, nz=nz)
    # dH_p: ct plane p - dx + rx sits in ring slot (p - dx + rx) % R
    dH = ctring[(p + rx) % R].reshape(m_out, 128).astype(jnp.float32)
    for dx in range(1, kx):
        v = ctring[(p + rx - dx) % R].reshape(m_out, 128)
        dH = dH + pltpu.roll(v.astype(jnp.float32), dx * cout, axis=1)
    dn = (((0,), (0,)), ((), ()))
    for dy in range(ky):
        lhs = win[dy : dy + nys].reshape(m_out, kc)
        dws_ref[:, dy] += jax.lax.dot_general(
            lhs, dH.astype(lhs.dtype), dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )


def fusedconv_wgrad_3d(h, ct, *, cin, cout, k, nys=None, interpret=False):
    """Weight gradient in the packed (kc, k, 128) layout (see
    `unpack_dws`).  ct: (nx, ny, nz, 128) cotangent of the PRE-activation
    with lanes >= cout zeroed (the caller masks)."""
    nx, ny, nz, cp = h.shape
    kc = lanes(k * cin)
    assert ct.shape[:3] == (nx, ny, nz) and ct.shape[3] == 128
    if nys is None:
        nys = _pick_nys(ny, nz, kc, k,
                        itemsize=jnp.dtype(h.dtype).itemsize)
    assert nys is not None and ny % nys == 0 and k // 2 <= nys
    nstrip = ny // nys
    kernel = functools.partial(
        _fused_wgrad_kernel, kx=k, ky=k, kz=k, cin=cin, cout=cout,
        nx=nx, nys=nys, ny=ny, nz=nz,
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrip, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((kc, k, 128), lambda s, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kc, k, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nys + k - 1, nz + (2 * _ZP if k > 1 else 0), cp),
                       h.dtype),
            pltpu.VMEM((nys + k - 1, nz, kc), h.dtype),
            pltpu.VMEM((k + 1, nys, nz, 128), ct.dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((k + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(h, ct.astype(h.dtype))


def make_fused_layer(actname, has_bias, *, cin, cout, k, interpret=False):
    """Differentiable fused-fold conv layer over CANONICAL weights:
    ``layer(h, w, bias) -> act(conv(h, w) + bias)`` with Pallas forward
    AND backward (dh = same kernel, flipped/transposed taps; dw = the
    wgrad accumulator kernel).  h: (nx, ny, nz, cp >= lanes(cin));
    w: (k, k, k, cin, cout); returns (nx, ny, nz, 128), lanes >= cout
    garbage."""
    act, dact = _ACTS[actname]

    @jax.custom_vjp
    def layer(h, w, bias):
        ws = pack_ws(w, h.dtype)
        return fusedconv_3d(h, ws, bias if has_bias else None, act,
                            cin=cin, cout=cout, k=k, interpret=interpret)

    def _fwd(h, w, bias):
        y = layer(h, w, bias)
        return y, (h, w, y)

    def _bwd(res, ct):
        h, w, y = res
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
        dpre32 = jnp.where(
            lane < cout, dact(y.astype(jnp.float32),
                              ct.astype(jnp.float32)), 0.0
        )
        dpre = dpre32.astype(h.dtype)
        dws = fusedconv_wgrad_3d(h, dpre, cin=cin, cout=cout, k=k,
                                 interpret=interpret)
        dw = unpack_dws(dws, k, k, k, cin, cout).astype(w.dtype)
        db = (jnp.sum(dpre32[..., :cout], axis=(0, 1, 2)).astype(w.dtype)
              if has_bias else jnp.zeros((cout,), w.dtype))
        wsb = pack_ws_back(w, h.dtype)
        dh = fusedconv_3d(dpre, wsb, None, None, cin=cout, cout=cin,
                          k=k, interpret=interpret)
        return dh, dw, db

    layer.defvjp(_fwd, _bwd)
    return layer
