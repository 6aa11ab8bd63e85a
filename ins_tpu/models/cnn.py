"""CNN closure model (reference lib/NeuralClosure/src/cnn.jl).

Circular-padded convolution stack on collocated velocities, output
differentiated back to staggered faces. NHWC layout, flax.linen.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .closure import collocate, create_closure, decollocate

__all__ = ["cnn", "CNN"]


class CNN(nn.Module):
    radii: tuple
    channels: tuple  # output channels per layer; last must equal D
    activations: tuple  # callables, one per layer
    use_bias: tuple
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.ndim - 2
        assert self.channels[-1] == D, "Output must have D force channels"
        x = collocate(x)
        for i, r in enumerate(self.radii):
            x = nn.Conv(
                features=self.channels[i],
                kernel_size=(2 * r + 1,) * D,
                padding="CIRCULAR",
                use_bias=self.use_bias[i],
                dtype=self.dtype,
                param_dtype=self.dtype,
            )(x)
            x = self.activations[i](x)
        return decollocate(x)


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
