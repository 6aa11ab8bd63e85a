"""Multi-device domain decomposition tests on a virtual 8-device CPU mesh:
sharded runs must reproduce single-device runs (the distributed-equivalence
contract of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.parallel import make_mesh, shard_state, spatial_sharding


needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tgv_setup(n, dtype=jnp.float64):
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    return ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=dtype)


def _tgv_u(setup):
    return ins.velocityfield(
        setup,
        lambda d, x, y: -(d == 0) * jnp.sin(x) * jnp.cos(y)
        + (d == 1) * jnp.cos(x) * jnp.sin(y),
        doproject=False,
    )


@needs8
def test_sharded_solve_matches_single_device():
    """Periodic TGV with the CG solver (stencil + reduction path):
    spatial sharding over a (2, 4) mesh reproduces the single-device
    trajectory."""
    n = 30  # N = 32 divisible by 2 and 4
    setup = _tgv_setup(n)
    psolver = ins.psolver_cg(setup, reltol=1e-12)
    u0 = _tgv_u(setup)

    s_ref, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.05), dt=1e-2, psolver=psolver
    )

    mesh = make_mesh((2, 4))
    s_par, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.05), dt=1e-2, psolver=psolver,
        mesh=mesh,
    )
    diff = float(jnp.max(jnp.abs(s_par.u - s_ref.u)))
    assert diff < 1e-12, diff


@needs8
def test_sharded_dirichlet_cavity():
    """Stretched Dirichlet cavity on a (2, 2) spatial mesh with data
    parallel unused; BC fills at shard edges must match."""
    n = 30
    x = (ins.tanh_grid(0.0, 1.0, n, 1.1),) * 2
    lid = (1.0, 0.0)
    bc = (
        (ins.DirichletBC(), ins.DirichletBC()),
        (ins.DirichletBC(), ins.DirichletBC(lid)),
    )
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=500.0, dtype=jnp.float64)
    psolver = ins.psolver_cg(setup, reltol=1e-12)
    u0 = ins.velocityfield(setup, lambda d, x, y: 0.0 * x, psolver=psolver)

    s_ref, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.02), dt=2e-3, psolver=psolver
    )
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    s_par, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.02), dt=2e-3, psolver=psolver,
        mesh=mesh,
    )
    diff = float(jnp.max(jnp.abs(s_par.u - s_ref.u)))
    assert diff < 1e-11, diff


@needs8
def test_sharded_3d_smoke():
    n = 14  # N = 16 divisible by 2
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float64)
    psolver = ins.psolver_cg(setup, reltol=1e-10)
    u0 = ins.velocityfield(
        setup,
        lambda d, x, y, z: (d == 0) * jnp.sin(x) * jnp.cos(y)
        - (d == 1) * jnp.cos(x) * jnp.sin(y),
        psolver=psolver,
    )
    mesh = make_mesh((2, 2, 2))
    s, _ = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0.0, 0.01), dt=2e-3, psolver=psolver,
        mesh=mesh,
    )
    assert not np.any(np.isnan(s.u))


@needs8
def test_shard_state_divisibility_error():
    setup = _tgv_setup(16)  # N = 18 not divisible by 4
    u0 = _tgv_u(setup)
    mesh = make_mesh((2, 4))
    with pytest.raises(ValueError, match="divisible"):
        shard_state(mesh, u0)


@needs8
def test_dp_closure_training_step():
    """Data-parallel closure training: replicated params, batch over 'b'.
    Gradients psum over the mesh; result matches single-device."""
    import ins_tpu.models as nc
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = 16
    les = _tgv_setup(n, dtype=jnp.float32)
    closure, theta = nc.cnn(
        setup=les,
        radii=[1],
        channels=[2],
        activations=[lambda x: x],
        use_bias=[False],
        rng=jax.random.PRNGKey(0),
        # f32 convs: the default bf16 tap-folded copies are only
        # reduction-order-reproducible to ~bf16 eps, which this
        # replicated-vs-DP gradient parity check (rtol 2e-5) is not
        # about
        compute_dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (8, n, n, 2), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (8, n, n, 2), jnp.float32)
    loss = nc.create_loss_prior(closure)

    gref = jax.grad(lambda th: loss((x, y), th))(theta)

    mesh = make_mesh(batch=8, shape=())
    bs = NamedSharding(mesh, P("b"))
    rep = NamedSharding(mesh, P())
    xs, ys = jax.device_put(x, bs), jax.device_put(y, bs)
    ths = jax.device_put(theta, rep)
    gpar = jax.jit(
        jax.grad(lambda th: loss((xs, ys), th)),
        in_shardings=(rep,),
        out_shardings=rep,
    )(ths)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gpar)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)
