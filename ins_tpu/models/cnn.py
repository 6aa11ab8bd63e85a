"""CNN closure model (reference lib/NeuralClosure/src/cnn.jl).

Circular-padded convolution stack on collocated velocities, output
differentiated back to staggered faces.

TPU memory note: XLA's TPU convolution keeps the feature dim minor, so
a closure with 3..24 channels wastes most of the 128-wide lane tile on
every circular-pad intermediate (~128/C x — measured 42x at 128^3,
an HBM OOM in the a-posteriori gradient).  Large 3D inputs are
therefore evaluated in x-CHUNKS: the field is circularly halo-padded by
the stack's total receptive radius once, and `lax.map` runs the conv
stack slab by slab (VALID in x), which bounds the blown-up temporaries
to one chunk's worth in both the forward and the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .closure import collocate, create_closure, decollocate

__all__ = ["cnn", "CNN"]

_DN = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


class CNN(nn.Module):
    radii: tuple
    channels: tuple  # output channels per layer; last must equal D
    activations: tuple  # callables, one per layer
    use_bias: tuple
    dtype: object = jnp.float32
    chunk_x: int = 16  # x-chunk size for large 3D inputs

    @nn.compact
    def __call__(self, x):
        D = x.ndim - 2
        assert self.channels[-1] == D, "Output must have D force channels"
        in_dtype = x.dtype
        x = collocate(x).astype(self.dtype)  # (N, *spatial, D)
        dn = _DN[D]
        kinit = jax.nn.initializers.lecun_normal()
        ws, bs = [], []
        cin = D
        for i, r in enumerate(self.radii):
            cout = self.channels[i]
            ws.append(self.param(
                f"conv{i}_kernel", kinit,
                (2 * r + 1,) * D + (cin, cout), self.dtype,
            ))
            bs.append(
                self.param(f"conv{i}_bias", jax.nn.initializers.zeros,
                           (cout,), self.dtype)
                if self.use_bias[i]
                else None
            )
            cin = cout

        def stack(h, pad_x):
            for i, r in enumerate(self.radii):
                pads = [(0, 0)] + [(r, r)] * D + [(0, 0)]
                if not pad_x:
                    pads[1] = (0, 0)  # x halo supplied by the caller
                h = jnp.pad(h, pads, mode="wrap")
                h = jax.lax.conv_general_dilated(
                    h, ws[i], (1,) * D, "VALID", dimension_numbers=dn,
                )
                if bs[i] is not None:
                    h = h + bs[i]
                h = self.activations[i](h)
            return h

        R = sum(self.radii)
        nx = x.shape[1]
        cx = self.chunk_x
        if D == 3 and nx % cx == 0 and nx >= 4 * cx:
            # x-chunked evaluation (see module docstring)
            xp = jnp.pad(
                x, [(0, 0), (R, R)] + [(0, 0)] * D, mode="wrap"
            )
            idx = jnp.arange(nx // cx) * cx

            def body(i0):
                sl = jax.lax.dynamic_slice_in_dim(xp, i0, cx + 2 * R, 1)
                return stack(sl, pad_x=False)

            out = jax.lax.map(body, idx)  # (nchunk, N, cx, ny, nz, D)
            out = jnp.moveaxis(out, 0, 1).reshape(
                x.shape[0], nx, *x.shape[2:-1], D
            )
        else:
            out = stack(x, pad_x=True)
        return decollocate(out.astype(in_dtype))


def cnn(*, setup, radii, channels, activations, use_bias, rng):
    """Build `(closure, theta)` (reference cnn.jl:5-48)."""
    g = setup.grid
    D = g.dim
    n = tuple(e - s for (s, e) in g.Iu[0])
    model = CNN(
        radii=tuple(radii),
        channels=tuple(channels),
        activations=tuple(activations),
        use_bias=tuple(use_bias),
        dtype=setup.dtype,
    )
    return create_closure(
        model, rng=rng, sample_shape=(*n, D), dtype=setup.dtype
    )
