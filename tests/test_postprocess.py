"""Post-processing pipeline tests (mirrors reference test/postprocess.jl):
run a real 2D solve with all processors and assert outputs exist."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins


@pytest.fixture(scope="module")
def solved(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("post")
    n = 32
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=2e3, dtype=jnp.float64)
    psolver = ins.psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=5, rng=jax.random.PRNGKey(0))

    from ins_tpu.plotting import animator, realtimeplotter

    procs = {
        "log": ins.timelogger(nupdate=10),
        "vtk": ins.vtk_writer(
            setup=setup,
            nupdate=5,
            dir=str(tmp / "vtk"),
            fieldnames=("velocity", "vorticity"),
            psolver=psolver,
        ),
        "fields": ins.fieldsaver(nupdate=5),
        "spectrum": ins.observespectrum(setup, nupdate=5),
        "anim": animator(
            setup=setup, path=str(tmp / "anim.gif"), nupdate=5
        ),
        "plot": realtimeplotter(
            setup=setup,
            nupdate=10,
            figfile=str(tmp / "live.png"),
        ),
        "ckpt": ins.checkpointer(str(tmp / "ckpt"), nupdate=10, keep_last=2),
        "ehist": ins.observefield(
            lambda s: (float(s["t"]), float(ins.total_kinetic_energy(s["u"], setup))),
            nupdate=5,
        ),
    }
    state, out = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, 0.2),
        dt=1e-2,
        psolver=psolver,
        processors=procs,
    )
    return tmp, setup, psolver, u0, state, out


def test_vtk_outputs(solved):
    tmp, setup, psolver, u0, state, out = solved
    pvd = out["vtk"]
    assert os.path.exists(pvd)
    vtrs = [f for f in os.listdir(tmp / "vtk") if f.endswith(".vtr")]
    assert len(vtrs) == 5  # initial + steps 5, 10, 15, 20
    # pvd references them
    content = open(pvd).read()
    assert "DataSet" in content and ".vtr" in content


def test_save_vtk_single(solved, tmp_path):
    tmp, setup, psolver, u0, state, out = solved
    f = ins.save_vtk(
        ins.get_state(state),
        setup=setup,
        filename=str(tmp_path / "snap"),
        fieldnames=("velocity", "vorticity", "Qfield"),
        psolver=psolver,
    )
    assert os.path.exists(f)


def test_fieldsaver_and_spectrum(solved):
    tmp, setup, psolver, u0, state, out = solved
    assert len(out["fields"]) == 4
    sp = out["spectrum"]
    assert len(sp["ehat"]) == 4
    assert np.all(np.isfinite(sp["ehat"][-1]))
    assert len(sp["kappa"]) == len(sp["ehat"][0])


def test_field_evolves(solved):
    """Field meaningfully evolves (reference test: norm(a-b)/norm(b) > 0.05)."""
    tmp, setup, psolver, u0, state, out = solved
    a = out["fields"][0]["u"]
    b = out["fields"][-1]["u"]
    assert np.linalg.norm(a - b) / np.linalg.norm(b) > 0.05


def test_animation_and_plot(solved):
    tmp, setup, psolver, u0, state, out = solved
    assert os.path.exists(tmp / "anim.gif")
    assert os.path.exists(tmp / "live.png")


def test_checkpoint_roundtrip(solved):
    tmp, setup, psolver, u0, state, out = solved
    files = out["ckpt"]
    assert len(files) == 2  # keep_last=2
    like = dict(u=state.u, temp=None, t=state.t, n=state.n)
    ck = ins.load_checkpoint(files[-1], like)
    np.testing.assert_allclose(np.asarray(ck["u"]), np.asarray(state.u))
    assert float(ck["t"]) == pytest.approx(float(state.t))
    # Resume: continuing from the checkpoint matches continuing directly
    s2, _ = ins.solve_unsteady(
        setup=setup,
        ustart=ck["u"],
        tlims=(float(ck["t"]), float(ck["t"]) + 0.05),
        dt=1e-2,
        psolver=psolver,
    )
    s3, _ = ins.solve_unsteady(
        setup=setup,
        ustart=state.u,
        tlims=(float(state.t), float(state.t) + 0.05),
        dt=1e-2,
        psolver=psolver,
    )
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s3.u), atol=1e-12)


def test_energy_history_and_plots(solved, tmp_path):
    tmp, setup, psolver, u0, state, out = solved
    from ins_tpu.plotting import energy_history_plot, energy_spectrum_plot, plotgrid

    hist = out["ehist"]
    energy_history_plot(hist, path=str(tmp_path / "ehist.png"))
    sp = out["spectrum"]
    energy_spectrum_plot(
        sp["kappa"], sp["ehat"][-1], slope=-3, path=str(tmp_path / "spec.png")
    )
    plotgrid(
        np.asarray(setup.grid.x[0]),
        np.asarray(setup.grid.x[1]),
        path=str(tmp_path / "grid.png"),
    )
    for f in ("ehist.png", "spec.png", "grid.png"):
        assert os.path.exists(tmp_path / f)


def test_fieldobserver_all_names(solved):
    tmp, setup, psolver, u0, state, out = solved
    st = ins.get_state(state)
    for name in (
        0,
        1,
        "velocity",
        "velocitynorm",
        "vorticity",
        "pressure",
        "streamfunction",
        "Qfield",
        "B1",
        "V1",
    ):
        obs = ins.fieldobserver(setup, name, psolver=psolver)
        v = obs(st)
        assert np.all(np.isfinite(np.asarray(v))), name


def test_sciml_rhs(solved):
    """RHS bridge: divergence-free output, matches a tiny Euler step."""
    tmp, setup, psolver, u0, state, out = solved
    f = ins.create_right_hand_side(setup, psolver)
    du = f(u0, 0.0)
    assert du.shape == u0.shape
    div = ins.divergence(
        ins.apply_bc_u(du, jnp.asarray(0.0), setup), setup
    )
    assert float(jnp.max(jnp.abs(div))) < 1e-8
    # differentiable
    g = jax.grad(lambda u: jnp.sum(f(u, 0.0) ** 2))(u0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sciml_rhs_temperature():
    """RHS bridge with a Boussinesq state returns (du, dtemp); buoyancy
    enters du and both are differentiable (closes the reference's
    momentum-only sciml.jl:13-31 gap)."""
    from conftest import make_setup_2d

    setup = make_setup_2d(n=12)
    psolver = ins.psolver_direct(setup)
    f = ins.create_right_hand_side(setup, psolver)
    g = setup.grid
    u0 = jnp.zeros((2, *g.N), setup.dtype)
    temp0 = ins.temperaturefield(
        setup, lambda x, y: jnp.sin(jnp.pi * x) * jnp.cos(jnp.pi * y)
    )
    du, dtemp = f(u0, 0.0, temp=temp0)
    assert du.shape == u0.shape and dtemp.shape == temp0.shape
    assert np.all(np.isfinite(np.asarray(du)))
    assert np.all(np.isfinite(np.asarray(dtemp)))
    # buoyancy: a nonuniform temperature must change the momentum RHS
    du0 = f(u0, 0.0)
    assert float(jnp.max(jnp.abs(du - du0))) > 1e-12
    # nontrivial temperature dynamics
    assert float(jnp.max(jnp.abs(dtemp))) > 1e-12
    # differentiable through both outputs wrt both state entries
    def loss(u, temp):
        a, b = f(u, 0.0, temp=temp)
        return jnp.sum(a**2) + jnp.sum(b**2)

    gu, gt = jax.grad(loss, argnums=(0, 1))(u0, temp0)
    assert np.all(np.isfinite(np.asarray(gu)))
    assert np.all(np.isfinite(np.asarray(gt)))


def test_plotgrid_3d_and_contour3d(tmp_path):
    """3D plotgrid wireframe + 3D contour fieldplot (reference Makie ext
    :31-72 and :204 parity)."""
    import jax

    from ins_tpu.plotting import fieldplot, plotgrid

    plotgrid(
        np.linspace(0, 1, 9),
        np.linspace(0, 2, 17),
        np.linspace(0, 1, 5),
        path=str(tmp_path / "grid3d.png"),
    )
    assert os.path.exists(tmp_path / "grid3d.png")

    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup3 = ins.Setup(x=x, boundary_conditions=bc, Re=1e3,
                       dtype=jnp.float64)
    u = ins.random_field(setup3, kp=3, rng=jax.random.PRNGKey(0))
    st = {"u": u, "temp": None, "t": jnp.asarray(0.0), "n": 0}
    fig = fieldplot(st, setup=setup3, fieldname="velocitynorm",
                    type="contour")
    fig.savefig(str(tmp_path / "contour3d.png"))
    assert os.path.exists(tmp_path / "contour3d.png")


def test_jax_profiler_processor(tmp_path):
    """jax_profiler captures a trace window [start_n, stop_n) and writes
    profile files (SURVEY §5.1)."""
    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float64)
    psolver = ins.psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(0))
    logdir = str(tmp_path / "trace")

    from ins_tpu.processors import jax_profiler

    _, outputs = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.01), dt=1e-3, psolver=psolver,
        processors={"prof": jax_profiler(logdir, start_n=2, stop_n=6)},
    )
    assert outputs["prof"]["done"] and not outputs["prof"]["on"]
    found = [
        os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs
    ]
    assert found, "profiler wrote no trace files"
