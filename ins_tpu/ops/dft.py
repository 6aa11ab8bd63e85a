"""TPU-safe spectral transforms and the MXU Poisson solve.

Two facts about XLA's TPU FFT, measured on a v5e (probes recorded in
tests/test_dft.py):

1. *Fused multi-axis* transforms fall off a precision cliff above ~2^24
   elements: a 3D 256^3 `rfftn`/`irfftn` roundtrip has **0.33** relative
   error (vs 2.8e-7 on CPU, and vs 3.5e-7 for the same TPU call at
   128^3). Single-axis transforms stay at f32 accuracy at every probed
   size, so decomposing an N-D transform into 1-D passes is safe — BUT
   XLA re-fuses adjacent 1-D FFT ops back into the broken multi-axis
   kernel, so the per-axis decomposition must be separated by
   `lax.optimization_barrier` (measured: chained per-axis at 256^3 =
   0.35 rel roundtrip error; barriered = 3.7e-7).
2. The fast-diagonalization Poisson solve in the analytic real Fourier
   basis — six `Precision.HIGHEST` MXU matmuls at 256^3 — is both ~2x
   *faster* than the fused-FFT solve (3.2 ms vs 6.5 ms) and accurate to
   2.8e-7 vs a float64 reference.

Hence this module provides (a) `fftn`/`ifftn`/`rfftn`/`irfftn` that
delegate to the fused `jnp.fft` kernels on CPU but decompose into
per-axis 1-D transforms on accelerators, and (b) `make_poisson_mm`, the
matmul projection solve used by the periodic-uniform pressure path on
accelerators (reference solver: src/pressure.jl:295-330, redesigned for
the MXU rather than translated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "backend_is_cpu",
    "fftn",
    "ifftn",
    "rfftn",
    "irfftn",
    "fourier_eigenbasis",
    "make_poisson_mm",
]


def backend_is_cpu():
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------------
# Per-axis-safe N-D FFTs
# --------------------------------------------------------------------------


def _nofuse(x):
    """Stop XLA from re-fusing adjacent 1-D FFTs into the (inaccurate at
    >=2^24 elements) multi-axis TPU FFT kernel (module docs, fact 1)."""
    return lax.optimization_barrier(x)


def fftn(x, axes=None):
    if axes is None:
        axes = tuple(range(x.ndim))
    if backend_is_cpu():
        return jnp.fft.fftn(x, axes=axes)
    for i, ax in enumerate(axes):
        if i:
            x = _nofuse(x)
        x = jnp.fft.fft(x, axis=ax)
    return x


def ifftn(x, axes=None):
    if axes is None:
        axes = tuple(range(x.ndim))
    if backend_is_cpu():
        return jnp.fft.ifftn(x, axes=axes)
    for i, ax in enumerate(axes):
        if i:
            x = _nofuse(x)
        x = jnp.fft.ifft(x, axis=ax)
    return x


def rfftn(x, axes=None):
    """Real N-D FFT: real transform along the last of `axes`."""
    if axes is None:
        axes = tuple(range(x.ndim))
    if backend_is_cpu():
        return jnp.fft.rfftn(x, axes=axes)
    x = jnp.fft.rfft(x, axis=axes[-1])
    for ax in axes[:-1]:
        x = jnp.fft.fft(_nofuse(x), axis=ax)
    return x


def irfftn(x, s, axes=None):
    """Inverse of `rfftn`; `s` is the full real output shape over `axes`."""
    if axes is None:
        axes = tuple(range(x.ndim))
    if backend_is_cpu():
        return jnp.fft.irfftn(x, s, axes=axes)
    for ax in axes[:-1]:
        x = jnp.fft.ifft(x, axis=ax)
        x = _nofuse(x)
    return jnp.fft.irfft(x, s[-1], axis=axes[-1])


# --------------------------------------------------------------------------
# Analytic real Fourier eigenbasis + MXU Poisson solve
# --------------------------------------------------------------------------


def fourier_eigenbasis(n, dx):
    """Real orthonormal eigenbasis of the periodic 1-D second-difference
    operator on `n` points with spacing `dx` (float64).

    Returns (V, Vinv, lam): columns of V are the constant mode, cos/sin
    pairs, and (even n) the Nyquist mode, delta-orthonormal so that
    V^T diag(dx) V = I; lam[k] = -4 sin^2(pi k / n) / dx^2 repeated per
    pair — the eigenvalues of the stencil (1, -2, 1)/dx^2.
    """
    j = np.arange(n)
    cols = [np.full(n, 1.0)]
    lams = [0.0]
    for k in range(1, n // 2 + 1):
        lam_k = -4.0 * np.sin(np.pi * k / n) ** 2 / dx**2
        if 2 * k < n:
            cols.append(np.sqrt(2.0) * np.cos(2 * np.pi * k * j / n))
            cols.append(np.sqrt(2.0) * np.sin(2 * np.pi * k * j / n))
            lams.extend([lam_k, lam_k])
        else:  # Nyquist (even n): alternating +-1
            cols.append(np.cos(np.pi * j))
            lams.append(lam_k)
    V = np.stack(cols, axis=1) / np.sqrt(n * dx)
    Vinv = V.T * dx
    return V, Vinv, np.asarray(lams)


def _tdot(m, x, axis, prec):
    x = jnp.tensordot(m, x, axes=([1], [axis]), precision=prec)
    return jnp.moveaxis(x, 0, axis)


def make_poisson_mm(Np, dxs, dtype):
    """Solve L p = f on a uniform periodic box via MXU matmuls, where L is
    the volume-scaled Laplacian (row: sum_d (p[+d] - 2p + p[-d]) vol/dx_d^2)
    and the zero-mean (nullspace) mode is pinned to zero.

    Same math as the spectral solver — fast diagonalization in the real
    Fourier basis — but runs as 2*D `Precision.HIGHEST` tensor
    contractions, which on TPU are both faster and far more accurate than
    the fused XLA FFT (module docs).
    """
    D = len(Np)
    vol = float(np.prod(dxs))
    Vs, Vinvs, lams = [], [], []
    eps = 0.0
    for d in range(D):
        V, Vinv, lam = fourier_eigenbasis(Np[d], dxs[d])
        Vs.append(jnp.asarray(V, dtype))
        Vinvs.append(jnp.asarray(Vinv, dtype))
        eps += float(np.max(np.abs(lam * vol)))
        lams.append(jnp.asarray(lam * vol, dtype))
    eps = 1e-12 * eps
    prec = lax.Precision.HIGHEST

    def solve(f):
        x = f
        for d in range(D):
            x = _tdot(Vinvs[d], x, d, prec)
        # Denominator built in-graph from the 1-D eigenvalue vectors (a
        # precomputed N-D constant would embed n^3*4 bytes into the
        # compile payload — 512 MB at 512^3; the broadcast-add fuses
        # into the multiply, so this is also one less HBM read)
        den = lams[0].reshape([-1] + [1] * (D - 1))
        for d in range(1, D):
            den = den + lams[d].reshape(
                [-1 if i == d else 1 for i in range(D)]
            )
        x = jnp.where(
            jnp.abs(den) < eps,
            jnp.zeros_like(x),
            x / jnp.where(den == 0.0, jnp.ones_like(den), den),
        )
        for d in range(D):
            x = _tdot(Vs[d], x, d, prec)
        return x

    return solve
