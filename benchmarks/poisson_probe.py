"""Probe: fused Pallas Poisson solve vs the XLA 6-contraction solve.

The periodic-uniform Poisson solve (ops/dft.py make_poisson_mm) is the
largest remaining cost of the 256^3 step (~7.6 ms of 21 per RK44 step,
ROADMAP "measured floors").  The XLA formulation runs 6 full HBM passes
(one per tensor contraction).  This probe measures a 3-pass Pallas
variant:

  pass A (x-slabs):   z-forward + y-forward      (2 matmuls, 1 HBM pass)
  pass B (y-blocks):  x-forward, eigen-scale, x-inverse (1 HBM pass)
  pass C (x-slabs):   y-inverse + z-inverse      (1 HBM pass)

plus precision ablations (HIGHEST vs HIGH) and accuracy checks against
the f64 CPU solve semantics (residual of the discrete Laplacian).

Run: python benchmarks/poisson_probe.py [n]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from ins_tpu.ops.dft import fourier_eigenbasis, make_poisson_mm  # noqa: E402


def make_consts(n, dx, dtype):
    V, Vinv, lam = fourier_eigenbasis(n, dx)
    vol = dx**3
    den = (
        lam[:, None, None] + lam[None, :, None] + lam[None, None, :]
    ) * vol
    small = np.abs(den) < 1e-12 * np.max(np.abs(den))
    inv_den = np.where(small, 0.0, 1.0 / np.where(small, 1.0, den))
    c = lambda a: jnp.asarray(a, dtype)
    return c(V), c(Vinv), c(inv_den)


# --------------------------------------------------------------------------
# Pallas 3-pass solve
# --------------------------------------------------------------------------


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_h(a, b, prec, dn=None):
    """Matmul at ~Precision.HIGH cost: 3 bf16 MXU passes (hi*hi + hi*lo +
    lo*hi), f32 accumulate — Pallas rejects precision=HIGH directly."""
    kw = dict(preferred_element_type=jnp.float32)
    if dn is None:
        op = lambda x, y: jnp.dot(x, y, **kw)
    else:
        op = lambda x, y: lax.dot_general(x, y, dimension_numbers=dn, **kw)
    if prec is not None:  # exact-precision fallback
        if dn is None:
            return jnp.dot(a, b, precision=prec, **kw)
        return lax.dot_general(a, b, dimension_numbers=dn, precision=prec, **kw)
    ah, al = _split(a)
    bh, bl = _split(b)
    return op(ah, bh) + op(ah, bl) + op(al, bh)


def _passA_kernel(f_ref, vinvy_ref, vinvzT_ref, out_ref, *, bx, n, prec):
    # z-forward: contract lanes; leading-dim collapse is free
    t = _dot_h(f_ref[...].reshape(bx * n, n), vinvzT_ref[...], prec).reshape(
        bx, n, n
    )
    # y-forward: per-plane 2D matmul
    for xi in range(bx):
        out_ref[xi, :, :] = _dot_h(vinvy_ref[...], t[xi], prec)


def _passB_kernel(h_ref, vinvx_ref, vx_ref, den_ref, out_ref, *, by, n, prec):
    # x-forward, scale, x-inverse; contraction over the leading dim
    dn = (((1,), (0,)), ((), ()))
    g = _dot_h(vinvx_ref[...], h_ref[...], prec, dn)
    g = g * den_ref[...]
    out_ref[...] = _dot_h(vx_ref[...], g, prec, dn)


def _passB_kernel_unroll(h_ref, vinvx_ref, vx_ref, den_ref, out_ref, *, by, n, prec):
    for yi in range(by):
        g = jnp.dot(
            vinvx_ref[...],
            h_ref[:, yi, :],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        g = g * den_ref[:, yi, :]
        out_ref[:, yi, :] = jnp.dot(
            vx_ref[...],
            g,
            preferred_element_type=jnp.float32,
            precision=prec,
        )


def _passC_kernel(h_ref, vy_ref, vzT_ref, out_ref, *, bx, n, prec):
    t = []
    for xi in range(bx):
        t.append(_dot_h(vy_ref[...], h_ref[xi], prec))
    t = jnp.stack(t).reshape(bx * n, n)
    out_ref[...] = _dot_h(t, vzT_ref[...], prec).reshape(bx, n, n)


def make_pallas_solve(n, dx, dtype, *, bx=8, by=8, prec=lax.Precision.HIGHEST,
                      unrollB=False, vmem_mb=96):
    V, Vinv, inv_den = make_consts(n, dx, dtype)
    mm = pl.BlockSpec(memory_space=pltpu.VMEM)  # full-array resident
    cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)

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
        compiler_params=cparams,
    )
    kB = _passB_kernel_unroll if unrollB else _passB_kernel
    passB = pl.pallas_call(
        functools.partial(kB, by=by, n=n, prec=prec),
        grid=(n // by,),
        in_specs=[
            pl.BlockSpec((n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            mm,
            mm,
            pl.BlockSpec((n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, by, n), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, n), dtype),
        compiler_params=cparams,
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
        compiler_params=cparams,
    )

    def solve(f):
        h = passA(f, Vinv, Vinv.T)
        h = passB(h, Vinv, V, inv_den)
        return passC(h, V, V.T)

    stages = {
        "A": lambda f: passA(f, Vinv, Vinv.T),
        "B": lambda h: passB(h, Vinv, V, inv_den),
        "C": lambda h: passC(h, V, V.T),
    }
    return solve, stages


# --------------------------------------------------------------------------


def timeit(fn, x, iters=30):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def timeit_scan(solve, x, length=20, reps=3):
    """In-graph per-solve time: scan the solve into one compiled program
    (output feeds input), removing per-dispatch tunnel overhead."""
    @jax.jit
    def many(f):
        def body(c, _):
            return solve(c), None
        return jax.lax.scan(body, f, None, length=length)[0]

    y = many(x)
    jax.block_until_ready(y)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        y = many(x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / length * 1e3)
    return best


def residual(p, f, dx):
    """|| vol*lap(p) - (f - mean f) || / ||f||, roll-graph Laplacian."""
    vol = dx**3
    lap = sum(
        (jnp.roll(p, -1, a) - 2 * p + jnp.roll(p, 1, a)) / dx**2 for a in range(3)
    ) * vol
    f0 = f - jnp.mean(f)
    return float(jnp.linalg.norm(lap - f0) / jnp.linalg.norm(f))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dx = 2 * np.pi / n
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, n, n), dtype)

    results = {}

    # Per-axis XLA FFT spectral solve (accurate per dft.py probes; speed
    # unknown at 256^3 — the *fused* 3D FFT was the slow/wrong one)
    from ins_tpu.ops.dft import irfftn as irfftn_ax, rfftn as rfftn_ax

    vol = dx**3
    kshape = (n, n, n // 2 + 1)
    den_f = np.zeros(kshape)
    for d in range(3):
        k = np.arange(kshape[d])
        den_f += (4 * vol * np.sin(np.pi * k / n) ** 2 / dx**2).reshape(
            [-1 if i == d else 1 for i in range(3)]
        )
    den_f[0, 0, 0] = 1.0
    # eigenvalues of the volume-scaled Laplacian are -den_f; pin k=0
    inv_f = -1.0 / den_f
    inv_f[0, 0, 0] = 0.0
    inv_f = jnp.asarray(inv_f, dtype)

    def solve_fft(fv):
        ph = rfftn_ax(fv) * inv_f
        return irfftn_ax(ph, fv.shape).astype(dtype)

    ms = timeit_scan(solve_fft, f)
    res = residual(jax.jit(solve_fft)(f), f, dx)
    results["fft_peraxis"] = (ms, res)
    print(f"{'fft_peraxis':24s} {ms:7.3f} ms  residual {res:.3e}", flush=True)

    # XLA 6-contraction baseline (in-graph)
    solve = make_poisson_mm((n,) * 3, (dx,) * 3, dtype)
    ms = timeit_scan(solve, f)
    res = residual(jax.jit(solve)(f), f, dx)
    results["xla6_highest"] = (ms, res)
    print(f"{'xla6_highest':24s} {ms:7.3f} ms  residual {res:.3e}", flush=True)

    # Pallas 3-pass variants (in-graph)
    for prec, pname in [
        (lax.Precision.HIGHEST, "highest"),
        (None, "manualhigh"),
    ]:
        name = f"pallas3_{pname}"
        try:
            solve, stages = make_pallas_solve(n, dx, dtype, bx=8, by=8, prec=prec)
            ms = timeit_scan(solve, f)
            res = residual(jax.jit(solve)(f), f, dx)
            results[name] = (ms, res)
            print(f"{name:24s} {ms:7.3f} ms  residual {res:.3e}", flush=True)
        except Exception as e:  # keep probing other variants
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    best = min(results.items(), key=lambda kv: kv[1][0])
    print("\nbest:", best[0], best[1])


if __name__ == "__main__":
    main()
