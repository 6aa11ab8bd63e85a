"""Plotting and animation (matplotlib).

Re-design of the reference Makie extension
(ext/IncompressibleNavierStokesMakieExt.jl): same function names
(`plotgrid`, `fieldplot`, `realtimeplotter`, `animator`,
`energy_history_plot`, `energy_spectrum_plot`) on matplotlib.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .ops._stencil import slc  # noqa: E402
from .processors import Processor  # noqa: E402

__all__ = [
    "plotgrid",
    "fieldplot",
    "realtimeplotter",
    "animator",
    "energy_history_plot",
    "energy_spectrum_plot",
]


def plotgrid(x, y, z=None, *, path=None):
    """Plot a (non)uniform Cartesian grid (reference Makie ext :31-72).

    2D: planar gridlines. 3D: box-face wireframes on a 3D axes plus the
    three planar projections (the reference's 2x2 Axis3/Axis layout,
    ext :38-71)."""
    x, y = np.asarray(x), np.asarray(y)
    if z is None:
        fig, ax = plt.subplots()
        for xi in x:
            ax.plot([xi, xi], [y[0], y[-1]], "k", lw=0.5)
        for yi in y:
            ax.plot([x[0], x[-1]], [yi, yi], "k", lw=0.5)
        ax.set_aspect("equal")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        if path:
            fig.savefig(path, dpi=120)
            plt.close(fig)
        return fig

    z = np.asarray(z)
    fig = plt.figure(figsize=(9, 8))
    ax3 = fig.add_subplot(2, 2, 1, projection="3d")
    X, Y = np.meshgrid(x, y, indexing="ij")
    # z = const faces
    for zc in (z[0], z[-1]):
        ax3.plot_wireframe(X, Y, np.full_like(X, zc), color="k", lw=0.3)
    # y = const faces
    Xz, Z = np.meshgrid(x, z, indexing="ij")
    for yc in (y[0], y[-1]):
        ax3.plot_wireframe(Xz, np.full_like(Xz, yc), Z, color="k", lw=0.3)
    # x = const faces
    Yz, Z2 = np.meshgrid(y, z, indexing="ij")
    for xc in (x[0], x[-1]):
        ax3.plot_wireframe(np.full_like(Yz, xc), Yz, Z2, color="k", lw=0.3)
    ax3.set_xlabel("x")
    ax3.set_ylabel("y")
    ax3.set_zlabel("z")

    for i, (a, b, la, lb) in enumerate(
        [(x, y, "x", "y"), (y, z, "y", "z"), (x, z, "x", "z")], start=2
    ):
        ax = fig.add_subplot(2, 2, i)
        for ai in a:
            ax.plot([ai, ai], [b[0], b[-1]], "k", lw=0.5)
        for bi in b:
            ax.plot([a[0], a[-1]], [bi, bi], "k", lw=0.5)
        ax.set_aspect("equal")
        ax.set_xlabel(la)
        ax.set_ylabel(lb)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def fieldplot(state, *, setup, fieldname="vorticity", psolver=None, ax=None,
              type=None, levels=None, **kwargs):
    """Plot a derived field at pressure points (reference Makie ext
    `fieldplot`, :129 2D heatmap / :204 3D contour).

    2D: heatmap. 3D default: middle-z-slice heatmap. 3D with
    `type="contour"`: the reference's volume-contour view approximated
    as iso-level contours of the three orthogonal mid-plane slices drawn
    in a 3D axes (matplotlib has no GPU volume renderer)."""
    from .processors import fieldobserver

    obs = fieldobserver(setup, fieldname, psolver=psolver)
    f = np.asarray(obs(state))
    g = setup.grid

    if g.dim == 3 and type == "contour":
        xp = [np.asarray(g.xp[d])[slc(g.Ip)[d]] for d in range(3)]
        if levels is None:
            lo, hi = np.percentile(f, [65, 99])
            levels = np.linspace(lo, hi, 5)
        fig = plt.figure()
        ax3 = fig.add_subplot(projection="3d")
        mid = [s // 2 for s in f.shape]
        X, Y = np.meshgrid(xp[0], xp[1], indexing="ij")
        ax3.contour(X, Y, f[:, :, mid[2]], zdir="z",
                    offset=float(xp[2][mid[2]]), levels=levels, **kwargs)
        X, Z = np.meshgrid(xp[0], xp[2], indexing="ij")
        ax3.contour(X, f[:, mid[1], :], Z, zdir="y",
                    offset=float(xp[1][mid[1]]), levels=levels, **kwargs)
        Y, Z = np.meshgrid(xp[1], xp[2], indexing="ij")
        ax3.contour(f[mid[0], :, :], Y, Z, zdir="x",
                    offset=float(xp[0][mid[0]]), levels=levels, **kwargs)
        ax3.set_xlim(xp[0][0], xp[0][-1])
        ax3.set_ylim(xp[1][0], xp[1][-1])
        ax3.set_zlim(xp[2][0], xp[2][-1])
        ax3.set_title(str(fieldname))
        return fig

    if g.dim == 3:
        f = f[..., f.shape[-1] // 2]
    xp = np.asarray(setup.grid.xp[0])[slc(g.Ip)[0]]
    yp = np.asarray(setup.grid.xp[1])[slc(g.Ip)[1]]
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    im = ax.pcolormesh(xp, yp, f.T, shading="auto", **kwargs)
    ax.set_aspect("equal")
    ax.set_title(str(fieldname))
    fig.colorbar(im, ax=ax)
    return fig


def realtimeplotter(*, setup, fieldname="vorticity", nupdate=1, psolver=None,
                    displayupdates=False, figfile=None, **kwargs):
    """Processor that refreshes a field plot every `nupdate` steps
    (headless: optionally saves to `figfile`)."""
    from .processors import fieldobserver

    obs = fieldobserver(setup, fieldname, psolver=psolver)

    def initialize(state):
        fig, ax = plt.subplots()
        return dict(fig=fig, ax=ax)

    def update(ps, state):
        ps["ax"].clear()
        fieldplot(state, setup=setup, fieldname=fieldname, psolver=psolver,
                  ax=ps["ax"], **kwargs)
        if figfile:
            ps["fig"].savefig(figfile, dpi=100)
        return ps

    def finalize(ps, state):
        fig = ps["fig"]
        plt.close(fig)
        return fig

    return Processor(initialize, update, finalize, nupdate)


def animator(*, setup, path, fieldname="vorticity", nupdate=1, psolver=None,
             fps=10, **kwargs):
    """Processor that records a field animation to `path` (.gif via
    pillow, .mp4 via ffmpeg if available), reference Makie `animator`."""
    from .processors import fieldobserver

    obs = fieldobserver(setup, fieldname, psolver=psolver)
    g = setup.grid

    def initialize(state):
        return dict(frames=[])

    def update(ps, state):
        f = np.asarray(obs(state))
        if g.dim == 3:
            f = f[..., f.shape[-1] // 2]
        ps["frames"].append(f)
        return ps

    def finalize(ps, state):
        frames = ps["frames"]
        if not frames:
            return None
        fig, ax = plt.subplots()
        vmin = min(f.min() for f in frames)
        vmax = max(f.max() for f in frames)
        im = ax.imshow(frames[0].T, origin="lower", vmin=vmin, vmax=vmax,
                       animated=True, **kwargs)
        ax.set_title(str(fieldname))

        import matplotlib.animation as anim

        def draw(i):
            im.set_array(frames[i].T)
            return (im,)

        a = anim.FuncAnimation(fig, draw, frames=len(frames), blit=True)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        writer = (
            anim.PillowWriter(fps=fps)
            if path.endswith(".gif")
            else anim.FFMpegWriter(fps=fps)
        )
        a.save(path, writer=writer)
        plt.close(fig)
        return path

    return Processor(initialize, update, finalize, nupdate)


def energy_history_plot(history, *, path=None):
    """Plot kinetic-energy history: `history` is a list of (t, E)
    (reference Makie ext :281)."""
    t, e = zip(*history)
    fig, ax = plt.subplots()
    ax.plot(t, e)
    ax.set_xlabel("t")
    ax.set_ylabel("E(t)")
    ax.set_title("Kinetic energy history")
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def energy_spectrum_plot(kappa, ehat, *, slope=None, path=None):
    """Log-log energy spectrum with optional inertial-slope overlay
    (reference Makie ext :297): slope defaults to -3 in 2D, -5/3 in 3D."""
    kappa = np.asarray(kappa, dtype=float)
    ehat = np.asarray(ehat, dtype=float)
    fig, ax = plt.subplots()
    ax.loglog(kappa, np.maximum(ehat, 1e-30), label="E(k)")
    if slope is not None:
        kref = kappa[kappa > 0]
        mid = max(np.max(ehat), 1e-30)
        ax.loglog(kref, mid * (kref / kref[0]) ** slope, "k--",
                  label=f"k^{slope:.3g}")
    ax.set_xlabel("k")
    ax.set_ylabel("E(k)")
    ax.legend()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig
