"""Discrete DNS -> LES filters (reference lib/NeuralClosure/src/filter.jl).

`FaceAverage` averages fine velocities over the coarse volume face;
`VolumeAverage` over the (shifted, periodic) coarse volume. Both are
implemented with precomputed gather indices reproducing the reference
kernels index-for-index (periodic grids; filters are data-prep, not the
hot loop). `reconstruct` linearly interpolates LES back to DNS.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["FaceAverage", "VolumeAverage", "reconstruct"]


def _gather_filter(u_a, idx_per_dim):
    """Average u_a over windows: idx_per_dim[d] has shape (nles, m_d) of
    0-based fine indices; returns (nles, ...) means."""
    D = len(idx_per_dim)
    out = u_a
    # Successively gather each dim: after processing dim d, axis layout is
    # (..., nles_d, m_d, ...)
    for d in range(D):
        idx = idx_per_dim[d]  # (nles, m)
        axis = 2 * d  # each processed dim expanded into two axes
        out = jnp.take(out, jnp.asarray(idx.reshape(-1)), axis=axis)
        out = out.reshape(
            out.shape[:axis] + idx.shape + out.shape[axis + 1 :]
        )
    # Mean over the window axes (odd positions)
    m = 1
    for d in range(D):
        m *= idx_per_dim[d].shape[1]
    win_axes = tuple(2 * d + 1 for d in range(D))
    return jnp.sum(out, axis=win_axes) / m


def _face_indices(g_les, comp, D, alpha):
    """0-based fine indices of the face window per dim (reference
    FaceAverage kernel, filter.jl:26-46)."""
    idx = []
    for b in range(D):
        nles = g_les.Nu[alpha][b]
        Ic = np.arange(nles)[:, None]
        if b == alpha:
            i = np.array([comp])[None, :]
        else:
            i = np.arange(1, comp + 1)[None, :]
        idx.append(comp * Ic + i)
    return idx


def _volume_indices(g_les, comp, D, alpha, n_dns):
    """0-based fine indices (periodic mod) of the shifted volume window
    (reference VolumeAverage kernel, filter.jl:80-116)."""
    idx = []
    for b in range(D):
        nles = g_les.Nu[alpha][b]
        Ic = np.arange(nles)[:, None]
        if b == alpha:
            if comp % 2 == 0:
                i = np.arange(comp // 2, comp // 2 + comp + 1)[None, :]
            else:
                i = np.arange(comp // 2 + 1, comp // 2 + comp + 1)[None, :]
        else:
            i = np.arange(1, comp + 1)[None, :]
        idx.append(np.mod(comp * Ic + i, n_dns[b]))
    return idx


@dataclasses.dataclass(frozen=True)
class FaceAverage:
    """Average fine velocities over the coarse volume face."""

    def __call__(self, u, setup_les, comp):
        g = setup_les.grid
        D = g.dim
        v = jnp.zeros((D, *g.N), u.dtype)
        for a in range(D):
            idx = _face_indices(g, comp, D, a)
            # Gather from the full ghosted DNS field (indices are already
            # absolute: fine index = comp*Ic + i, ghost offset included)
            val = _gather_filter(u[a], idx)
            sl = tuple(slice(s, s + g.Nu[a][b]) for b, (s, e) in enumerate(g.Iu[a]))
            v = v.at[(a,) + sl].set(val)
        return v


@dataclasses.dataclass(frozen=True)
class VolumeAverage:
    """Average fine velocities over the (component-shifted) coarse volume.
    Periodic only."""

    def __call__(self, u, setup_les, comp):
        g = setup_les.grid
        D = g.dim
        assert all(g.periodic), "VolumeAverage requires periodic BCs"
        n_dns = tuple(comp * (n - 2) for n in g.N)
        v = jnp.zeros((D, *g.N), u.dtype)
        for a in range(D):
            idx = _volume_indices(g, comp, D, a, n_dns)
            # mod indices address the DNS *cyclic interior*; the reference
            # indexes the ghosted field where index 0 (left ghost) equals
            # interior index n_dns (periodic copy), so gathering at the mod
            # result on the ghosted field reproduces it exactly.
            val = _gather_filter(u[a], idx)
            m = (comp + 1 if comp % 2 == 0 else comp) * comp ** (D - 1)
            mwin = np.prod([ix.shape[1] for ix in idx])
            val = val * (mwin / m)
            sl = tuple(slice(s, s + g.Nu[a][b]) for b, (s, e) in enumerate(g.Iu[a]))
            v = v.at[(a,) + sl].set(val)
        return v


def reconstruct(v, setup_dns, setup_les, comp):
    """Linear interpolation of LES velocity back onto the DNS grid
    (reference reconstruct!, filter.jl:49-78). Periodic only."""
    g_les = setup_les.grid
    g_dns = setup_dns.grid
    D = g_les.dim
    assert all(g_les.periodic)
    n_les = tuple(n - 2 for n in g_les.N)
    u = jnp.zeros((D, *g_dns.N), v.dtype)
    for a in range(D):
        # DNS face index f (0-based absolute, 1..n_dns): coarse cell
        # J = f // comp (in dim a), interpolation weight from fractional
        # position; other dims: piecewise-constant within the coarse cell.
        idx = []
        wts = None
        for b in range(D):
            n_dns_b = comp * n_les[b]
            f = np.arange(1, n_dns_b + 1)
            Jc = (f - 1) // comp  # coarse cell 0-based
            if b == a:
                # position within cell: i = comp - 1 - ((f-1) % comp)
                # value = ((comp - i) v[J] + i v[Jleft]) / comp
                i = comp - 1 - ((f - 1) % comp)
                wr = (comp - i) / comp
                wl = i / comp
                Jr = 1 + Jc
                Jl = 1 + np.mod(Jc - 1, n_les[b])
                idx.append((Jr, Jl))
                wts = (wr, wl)
            else:
                idx.append(1 + Jc)
        # Build by gathering along each dim
        def gather(field, which):
            out = field
            for b in reversed(range(D)):
                if b == a:
                    ib = idx[b][0] if which == "r" else idx[b][1]
                else:
                    ib = idx[b]
                out = jnp.take(out, jnp.asarray(ib), axis=b)
            return out

        vr = gather(v[a], "r")
        vl = gather(v[a], "l")
        shp = tuple(
            (len(idx[b][0]) if b == a else len(idx[b])) for b in range(D)
        )
        wshape = tuple(-1 if b == a else 1 for b in range(D))
        val = vr * jnp.asarray(wts[0].reshape(wshape)) + vl * jnp.asarray(
            wts[1].reshape(wshape)
        )
        sl = tuple(slice(1, 1 + s) for s in shp)
        u = u.at[(a,) + sl].set(val)
    return u
