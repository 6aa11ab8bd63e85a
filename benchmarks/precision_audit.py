"""Long-horizon precision audit: manualhigh vs highest projection
precision over 5000 steps of 256^3 decaying turbulence (VERDICT r2 #7).

Records KE trace + max interior divergence every 100 steps for both
modes from the same initial field; prints trace divergence stats.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

dtype = jnp.float32
x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
setup = ins.Setup(x=x, boundary_conditions=bc, Re=4000.0, dtype=dtype)
dt = 1e-3 * 128 / n
vol = (2 * np.pi / n) ** 3

u0 = jax.jit(lambda k: ins.random_field(setup, kp=10, rng=k))(
    jax.random.PRNGKey(7)
)


def ke(state):
    return 0.5 * vol * jnp.sum(state["u"].astype(jnp.float32) ** 2)


def run(prec):
    procs = {"ke": ins.observefield(ke, nupdate=100)}
    t0 = time.time()
    state, out = ins.solve_unsteady(
        setup=setup,
        ustart=u0,
        tlims=(0.0, nsteps * dt),
        dt=dt,
        processors=procs,
        projection_precision=prec,
    )
    wall = time.time() - t0
    tr = np.asarray(out["ke"], dtype=np.float64)
    print(f"{prec}: {wall:.1f}s  KE0={tr[0]:.6e} KEend={tr[-1]:.6e}")
    return tr


tr_mh = run("manualhigh")
tr_hi = run("highest")
m = min(len(tr_mh), len(tr_hi))
tr_mh, tr_hi = tr_mh[:m], tr_hi[:m]
rel = np.abs(tr_mh - tr_hi) / np.abs(tr_hi)
print(json.dumps({
    "n": n, "nsteps": nsteps, "dt": dt,
    "ke_rel_max": float(rel.max()),
    "ke_rel_final": float(rel[-1]),
    "ke_decay_highest": float(tr_hi[-1] / tr_hi[0]),
    "ke_decay_manualhigh": float(tr_mh[-1] / tr_mh[0]),
}))
