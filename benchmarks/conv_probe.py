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


if __name__ == "__main__":
    for mode in ("plain_f32", "plain_bf16", "fold_f32", "fold_bf16"):
        timeit(mode)
