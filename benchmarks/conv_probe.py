"""Probe XLA TPU conv formulations for the CNN closure stack.

Carry-dependent scan timing (the input of each iteration depends on the
previous output) so XLA cannot hoist the convs out of the loop.

Run on the TPU:  python benchmarks/conv_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ins_tpu.models.cnn import _fold_conv

N = 128
RADII = (2, 2, 2)
CH = (24, 24, 3)
STEPS = 10


def make_stack(mode):
    """mode: 'plain_f32' | 'plain_bf16' | 'fold_bf16' | 'fold_f32'."""
    cdt = jnp.bfloat16 if "bf16" in mode else jnp.float32
    fold = mode.startswith("fold")
    ws = []
    cin = 3
    key = jax.random.PRNGKey(0)
    for r, cout in zip(RADII, CH):
        key, k1 = jax.random.split(key)
        ws.append(0.05 * jax.random.normal(
            k1, (2 * r + 1,) * 3 + (cin, cout), jnp.float32))
        cin = cout

    dn = ("NDHWC", "DHWIO", "NDHWC")

    def stack(h):
        for w, r in zip(ws, RADII):
            if fold:
                h = _fold_conv(h, w, r, (True,) * 3, cdt)
            else:
                pads = [(0, 0)] + [(r, r)] * 3 + [(0, 0)]
                g = jnp.pad(h, pads, mode="wrap").astype(cdt)
                h = jax.lax.conv_general_dilated(
                    g, w.astype(cdt), (1,) * 3, "VALID",
                    dimension_numbers=dn,
                ).astype(h.dtype)
            h = jnp.tanh(h)
        return h

    return stack


def timeit(mode):
    stack = make_stack(mode)

    @jax.jit
    def run(x):
        def body(h, _):
            out = stack(h)
            # feed output back (3 ch) so nothing is loop-invariant
            return 0.9 * h[..., :3] + 0.1 * out, ()
        h, _ = jax.lax.scan(body, x, None, length=STEPS)
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (1, N, N, N, 3), jnp.float32)
    run(x).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / STEPS)
    flops = 0
    cin = 3
    for r, cout in zip(RADII, CH):
        flops += 2 * N**3 * (2 * r + 1) ** 3 * cin * cout
        cin = cout
    print(f"{mode:12s} {best*1e3:8.2f} ms/stack  {flops/best/1e12:6.2f} TFLOP/s")


def timeit_pallas(mode="pallas_bf16", grad=False):
    """Pallas conv path (ops/convkernels.py via models/cnn glue)."""
    from ins_tpu.models.cnn import _pallas_conv_layer

    cdt = jnp.bfloat16 if "bf16" in mode else jnp.float32
    ws, bs = [], []
    cin = 3
    key = jax.random.PRNGKey(0)
    for r, cout in zip(RADII, CH):
        key, k1 = jax.random.split(key)
        ws.append(0.05 * jax.random.normal(
            k1, (2 * r + 1,) * 3 + (cin, cout), jnp.float32))
        bs.append(jnp.zeros((cout,), jnp.float32))
        cin = cout
    actnames = ["tanh", "tanh", "id"]

    def stack(h, ws):
        for i, r in enumerate(RADII):
            h = _pallas_conv_layer(
                h[0], ws[i], bs[i], r, True, actnames[i], cdt, False
            )[None]
        return h

    if grad:
        @jax.jit
        def run(x, ws):
            def body(h, _):
                def loss(ws):
                    out = stack(h, ws)
                    return jnp.sum(out ** 2), out
                (l, out), g = jax.value_and_grad(loss, has_aux=True)(ws)
                gn = sum(jnp.sum(t) for t in jax.tree.leaves(g))
                return 0.9 * h + 0.1 * out + 1e-12 * gn, ()
            h, _ = jax.lax.scan(body, x, None, length=STEPS)
            return h
    else:
        @jax.jit
        def run(x, ws):
            def body(h, _):
                out = stack(h, ws)
                return 0.9 * h + 0.1 * out, ()
            h, _ = jax.lax.scan(body, x, None, length=STEPS)
            return h

    x = jax.random.normal(jax.random.PRNGKey(1), (1, N, N, N, 3), jnp.float32)
    run(x, ws).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(x, ws).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / STEPS)
    flops = 0
    cin = 3
    for r, cout in zip(RADII, CH):
        flops += 2 * N**3 * (2 * r + 1) ** 3 * cin * cout
        cin = cout
    if grad:
        flops *= 3  # fwd + dG + dW
    tag = mode + ("_grad" if grad else "")
    print(f"{tag:16s} {best*1e3:8.2f} ms/stack  {flops/best/1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    import sys
    if "--pallas-only" in sys.argv:
        timeit_pallas("pallas_bf16")
        timeit_pallas("pallas_bf16", grad=True)
    else:
        for mode in ("plain_f32", "plain_bf16", "fold_f32", "fold_bf16"):
            timeit(mode)
        timeit_pallas("pallas_bf16")
        timeit_pallas("pallas_f32")
        timeit_pallas("pallas_bf16", grad=True)
