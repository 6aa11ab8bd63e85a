"""Measure the a-posteriori training grad-step at 128^3 (VERDICT r2 #4
done-bar): jitted grad of create_loss_post (CNN closure, 5-step RK44
unroll, remat per step — the unrolled residuals alone are ~33 GB at
128^3) through the differentiable fast path vs the ghosted slice graph.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import sys
import time

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

import ins_tpu as ins
from ins_tpu.models import cnn, create_loss_post, wrappedclosure

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
nt = 6  # 5 unrolled steps
dtype = jnp.float32
x = (np.linspace(0.0, 2 * np.pi, n + 1),) * 3
bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
setup = ins.Setup(x=x, boundary_conditions=bc, Re=2000.0, dtype=dtype)

closure, theta = cnn(
    setup=setup,
    radii=[2, 2, 2],
    channels=[24, 24, 3],
    activations=[jnp.tanh, jnp.tanh, lambda x: x],
    use_bias=[True, True, False],
    rng=jax.random.PRNGKey(0),
)
model = wrappedclosure(closure, setup)

u0 = jax.jit(lambda k: ins.random_field(setup, kp=5, rng=k))(
    jax.random.PRNGKey(3)
)
# synthetic stored trajectory (shapes/timing only): nt ghosted snapshots
us = jnp.stack([u0 * (1.0 - 0.01 * i) for i in range(nt)])
ts = jnp.arange(nt, dtype=dtype) * 5e-4
data = [{"u": us, "t": ts}]

psolver = ins.psolver_spectral(setup)


def timeit(tag):
    loss = create_loss_post(
        setup=setup, method=ins.RKMethods.RK44(), psolver=psolver,
        closure_model=model, nsubstep=1, remat=True,
    )
    g = jax.jit(jax.grad(lambda th: loss(data, th)))
    t0 = time.time()
    gv = g(theta)
    jax.block_until_ready(gv)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        gv = g(theta)
    jax.block_until_ready(gv)
    per = (time.time() - t0) / 3
    gn = float(jnp.linalg.norm(
        jax.flatten_util.ravel_pytree(gv)[0]))
    print(f"{tag}: {per*1e3:.1f} ms/grad-step (compile {compile_s:.0f}s) "
          f"gradnorm={gn:.3e} finite={np.isfinite(gn)}")
    return per


fast = timeit("fast-diff path")

# force the ghosted slice-graph path for comparison
import ins_tpu.ops.fastpath as fp

saved = fp.fastpath_applicable
fp.fastpath_applicable = lambda *a, **k: False
try:
    slow = timeit("ghosted slice-graph")
finally:
    fp.fastpath_applicable = saved

print(f"speedup: {slow / fast:.2f}x")
