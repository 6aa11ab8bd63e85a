"""Neural-closure training workflow: generate filtered-DNS data, train a
CNN closure a-priori and a-posteriori, evaluate.

Port of the reference NeuralClosure example run
(lib/NeuralClosure/test/examplerun.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
import ins_tpu.models as nc
from ins_tpu.time_steppers.rk_methods import RK44


def run(quick=False, outdir=None):
    ndns = 64 if quick else 256
    nles = ndns // 4
    data = nc.create_les_data(
        D=2,
        Re=2e3,
        lims=(0.0, 1.0),
        nles=[nles],
        ndns=ndns,
        filters=(nc.FaceAverage(),),
        tburn=0.01 if quick else 0.1,
        tsim=0.05 if quick else 0.5,
        savefreq=4,
        dt=1e-3,
        rng=jax.random.PRNGKey(42),
        dtype=jnp.float32,
        processors={},
    )
    les = ins.Setup(
        x=(np.linspace(0.0, 1.0, nles + 1),) * 2,
        boundary_conditions=((ins.PeriodicBC(), ins.PeriodicBC()),) * 2,
        Re=2e3,
        dtype=jnp.float32,
    )
    io = nc.create_io_arrays(data, les)
    closure, theta = nc.cnn(
        setup=les,
        radii=[2, 2, 2],
        channels=[16, 16, 2],
        activations=[jax.nn.tanh, jax.nn.tanh, lambda x: x],
        use_bias=[True, True, False],
        rng=jax.random.PRNGKey(0),
    )
    dl = nc.create_dataloader_prior((io["u"], io["c"]), batchsize=8)
    relerr = nc.create_relerr_prior(
        closure, jnp.asarray(io["u"]), jnp.asarray(io["c"])
    )
    e0 = float(relerr(theta))
    ts = nc.create_trainstate(theta, lr=1e-3, rng=jax.random.PRNGKey(1))
    out = nc.train(
        dataloader=dl, loss=nc.create_loss_prior(closure), trainstate=ts,
        niter=20 if quick else 500,
    )
    e1 = float(relerr(out["trainstate"]["theta"]))

    # A-posteriori fine-tune through the differentiable solver
    m = nc.wrappedclosure(closure, les)
    ps = ins.psolver_spectral(les)
    lp = nc.create_loss_post(
        setup=les, method=RK44(), psolver=ps, closure_model=m
    )
    traj = [dict(u=d["u"], t=d["t"]) for d in data]
    dlp = nc.create_dataloader_post(traj, ntrajectory=1, nunroll=3)
    ts2 = nc.create_trainstate(
        out["trainstate"]["theta"], lr=1e-5, rng=jax.random.PRNGKey(2)
    )
    out2 = nc.train(
        dataloader=dlp, loss=lp, trainstate=ts2, niter=3 if quick else 100
    )
    return dict(relerr_init=e0, relerr_prior=e1)


if __name__ == "__main__":
    from _common import example_main

    example_main(run)
