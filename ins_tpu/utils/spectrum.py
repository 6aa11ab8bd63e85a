"""Energy-spectrum binning utilities.

Re-design of IncompressibleNavierStokes.jl `src/utils.jl:49-143`: dyadic
binning in 2D (k^-3 inertial slope), linear binning in 3D (k^-5/3). Bins
are precomputed as a dense (npoint, nk) boolean matrix so the in-loop
spectrum reduction is one masked matmul — MXU-friendly — instead of the
reference's per-bin index gathers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["spectral_stuff", "splitseed", "get_lims", "getoffset"]


def getoffset(box):
    """Starting offsets of an index box (reference `getoffset`,
    src/utils.jl:19-22: the offset of a `CartesianIndices`; here index
    boxes are tuples of `(start, end)` per dimension)."""
    return tuple(int(s) for s, _ in box)


def splitseed(seed, n):
    """Split an integer seed into `n` seeds (reference src/utils.jl:25)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32 - 1, size=n, dtype=np.uint32)


def get_lims(x, n=1.5):
    """Approximate field limits mu +- n sigma (reference src/utils.jl:32-38)."""
    x = np.asarray(x)
    mu, sigma = float(np.mean(x)), float(np.std(x))
    eps = float(np.finfo(x.dtype).eps)
    if abs(sigma) <= math.sqrt(eps) * (abs(mu) + 1):
        sigma = math.sqrt(math.sqrt(eps))
    return (mu - n * sigma, mu + n * sigma)


def spectral_stuff(setup, *, npoint=100, a=(1 + math.sqrt(5)) / 2):
    """Precompute spectrum bins.

    Returns dict with:
    - `kappa`: integer query wavenumbers (log-spaced),
    - `masks`: (npoint, *K) boolean bin masks (flattenable to a matmul),
    - `K`: per-dim wavenumber counts.
    """
    g = setup.grid
    D = g.dim
    K = tuple(n // 2 for n in g.Np)

    kk = np.zeros(K)
    for d in range(D):
        kd = np.arange(K[d]).reshape(
            tuple(-1 if i == d else 1 for i in range(D))
        )
        kk = kk + kd.astype(np.float64) ** 2
    k = np.sqrt(kk)

    kmax = min(K) - 1
    kappa = np.unique(
        np.round(
            np.exp(np.linspace(np.log(1.0), np.log(kmax), npoint))
        ).astype(int)
    )

    masks = []
    for kap in kappa:
        if D == 2:
            # Dyadic binning (k^-3 slope in 2D)
            m = (k >= kap / a) & (k < kap * a)
        else:
            # Linear binning (k^-5/3 slope in 3D)
            tol = 0.01
            m = (k >= kap - tol) & (k < kap + 1 - tol)
        masks.append(m)

    return dict(
        kappa=jnp.asarray(kappa),
        masks=jnp.asarray(np.stack(masks)),
        K=K,
    )


def observe_spectrum(u_hat_energy, masks):
    """Bin a (flattened) spectral energy field: one matmul over bin masks."""
    e = u_hat_energy.reshape(-1)
    m = masks.reshape(masks.shape[0], -1).astype(e.dtype)
    return m @ e
