"""Nusselt and wall-shear observables (no reference counterpart; standard
diagnostics for the RayleighBenard / cavity examples)."""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.processors import observe_nusselt, observe_wallshear


def _rb_setup(n=16):
    x = (np.linspace(0, 2.0, 2 * n + 1), np.linspace(0, 1.0, n + 1))
    bc = (
        ((ins.PeriodicBC(), ins.PeriodicBC()),)
        + ((ins.DirichletBC(), ins.DirichletBC()),)
    )
    tbc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(1.0), ins.DirichletBC(0.0)),
    )
    te = ins.temperature_equation(
        Pr=0.71, Ra=1e5, Ge=0.1, boundary_conditions=tbc,
        gdir=1, dtype=jnp.float64,
    )
    return ins.Setup(
        x=x, boundary_conditions=bc, temperature=te, dtype=jnp.float64
    )


def test_nusselt_pure_conduction_is_one():
    setup = _rb_setup()
    g = setup.grid
    u = jnp.zeros((2, *g.N), jnp.float64)
    temp = jnp.zeros(g.N, jnp.float64)
    proc = observe_nusselt(setup)
    ps = proc.initialize({"u": u, "temp": temp, "t": 0.0, "n": 0})
    assert abs(ps["Nu"][0] - 1.0) < 1e-12


def test_nusselt_constant_advection():
    """u_g = v, theta = c -> Nu = 1 + v*c/alpha4 exactly."""
    setup = _rb_setup()
    g = setup.grid
    v, c = 0.25, 0.8
    u = jnp.zeros((2, *g.N), jnp.float64).at[1].set(v)
    temp = jnp.full(g.N, c, jnp.float64)
    proc = observe_nusselt(setup)
    ps = proc.initialize({"u": u, "temp": temp, "t": 0.0, "n": 0})
    expect = 1.0 + v * c / float(setup.temperature.alpha4)
    assert abs(ps["Nu"][0] - expect) < 1e-10


def test_wallshear_linear_profile():
    """u_x(y) = y (Couette profile) -> tau_w = 1/Re on both walls."""
    n = 16
    x = (np.linspace(0, 1.0, n + 1), ins.cosine_grid(0.0, 1.0, n))
    bc = (
        (ins.PeriodicBC(), ins.PeriodicBC()),
        (ins.DirichletBC(), ins.DirichletBC((1.0, 0.0))),
    )
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=100.0,
                      dtype=jnp.float64)
    g = setup.grid
    # u_x = y evaluated at its staggered positions incl. ghost layer
    yy = jnp.asarray(np.asarray(g.xp[1]))[None, :]
    u = jnp.zeros((2, *g.N), jnp.float64)
    u = u.at[0].set(jnp.broadcast_to(yy, g.N))
    lo = observe_wallshear(setup, dim=1, side=0, component=0)
    hi = observe_wallshear(setup, dim=1, side=1, component=0)
    st = {"u": u, "temp": None, "t": 0.0, "n": 0}
    tau_lo = lo.initialize(st)["tau"][0]
    tau_hi = hi.initialize(st)["tau"][0]
    assert abs(tau_lo - 1.0 / 100.0) < 1e-12
    assert abs(tau_hi - 1.0 / 100.0) < 1e-12


def test_spectrum_binid_matches_dense_masks_3d():
    """The 3D segment_sum bin-id reduction must equal the dense-mask
    matmul it replaced (the masks needed O(npoint * prod(K)) memory —
    ~840 MB at 256^3; the bin-id map is one int per cell)."""
    import math

    from ins_tpu.utils.spectrum import observe_spectrum, spectral_stuff

    n = 16
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)
    st = spectral_stuff(setup, npoint=20)
    assert "bin_id" in st and "masks" not in st

    rng = np.random.default_rng(0)
    K = st["K"]
    e = jnp.asarray(rng.standard_normal(K) ** 2)
    got = observe_spectrum(e, st)

    # dense reference masks (the pre-round-3 formulation)
    kk = np.zeros(K)
    for d in range(3):
        kd = np.arange(K[d]).reshape([-1 if i == d else 1 for i in range(3)])
        kk = kk + kd.astype(np.float64) ** 2
    k = np.sqrt(kk)
    tol = 0.01
    want = np.stack(
        [
            ((k >= kap - tol) & (k < kap + 1 - tol)).reshape(-1)
            for kap in np.asarray(st["kappa"])
        ]
    ).astype(np.float64) @ np.asarray(e).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_spectrum_masks_2d_unchanged():
    from ins_tpu.utils.spectrum import observe_spectrum, spectral_stuff

    n = 32
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)
    st = spectral_stuff(setup, npoint=20)
    assert "masks" in st
    e = jnp.ones(st["K"], jnp.float64)
    got = np.asarray(observe_spectrum(e, st))
    want = np.asarray(st["masks"]).reshape(len(st["kappa"]), -1).sum(1)
    np.testing.assert_allclose(got, want)
