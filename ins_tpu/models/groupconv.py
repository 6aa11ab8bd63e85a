"""p4 group-equivariant CNN closure
(reference lib/NeuralClosure/src/groupconv.jl).

Equivariant to 90-degree rotations + translations of the staggered velocity
field. Rotation-state channels are materialized by assembling rotated
copies of a small weight set at call time (weight sharing), exactly as the
reference; convs run as one fused `lax.conv_general_dilated` per layer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .closure import collocate, create_closure, decollocate

__all__ = ["rot2", "vecrot2", "rot2stag", "GroupConv2D", "gcnn"]


def rot2(u, r):
    """Rotate a field 90 degrees counter-clockwise `r` times in its first
    two axes (reference groupconv.jl:22-42)."""
    return jnp.rot90(u, k=r % 4, axes=(0, 1))


def _vec_mix(rx, ry, r):
    r = r % 4
    if r == 0:
        return rx, ry
    if r == 1:
        return -ry, rx
    if r == 2:
        return -rx, -ry
    return ry, -rx


def vecrot2(u, r):
    """Rotate a 2D vector field `(nx, ny, 2)` (components last)
    (reference groupconv.jl:64-80)."""
    rx = rot2(u[..., 0], r)
    ry = rot2(u[..., 1], r)
    rx, ry = _vec_mix(rx, ry, r)
    return jnp.stack([rx, ry], axis=-1)


def rot2stag(u, g):
    """Rotate a staggered ghosted solver field `(2, N, N)` by 90 degrees
    `g` times, with the staggered-component shift fix
    (reference rot2stag, groupconv.jl:100-114)."""
    g = g % 4
    v = jnp.stack([u[0], u[1]], axis=-1)
    v = vecrot2(v, g)
    ux, uy = v[..., 0], v[..., 1]
    if g in (1, 2):
        ux = jnp.roll(ux, -1, axis=0)
        ux = ux.at[-1, :].set(ux[1, :])
    if g in (2, 3):
        uy = jnp.roll(uy, -1, axis=1)
        uy = uy.at[:, -1].set(uy[:, 1])
    return jnp.stack([ux, uy], axis=0)


class GroupConv2D(nn.Module):
    """p4 group conv: lifting (vector -> 4 rotation states), regular
    (states -> states), or projecting (states -> vector)
    (reference GroupConv2D, groupconv.jl:129-256)."""

    kernel_size: tuple
    cin: int
    cout: int
    activation: object = lambda x: x
    islifting: bool = False
    isprojecting: bool = False
    use_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert not (self.islifting and self.isprojecting)
        kh, kw = self.kernel_size
        init = nn.initializers.glorot_uniform(in_axis=2, out_axis=3)
        nw = 2 if (self.islifting or self.isprojecting) else 4
        ws = [
            self.param(f"w{i+1}", init, (kh, kw, self.cin, self.cout), self.dtype)
            for i in range(nw)
        ]
        group = (0, 1, 2, 3)
        if self.islifting:
            w1, w2 = ws
            blocks = []
            for n in group:
                wx, wy = _vec_mix(rot2(w1, n), rot2(w2, n), n)
                blocks.append(jnp.concatenate([wx, wy], axis=2))
            kernel = jnp.concatenate(blocks, axis=3)  # (k,k,2cin,4cout)
        elif self.isprojecting:
            w1, w2 = ws
            blocks = []
            for m in group:
                wx, wy = _vec_mix(rot2(w1, m), rot2(w2, m), m)
                blocks.append(jnp.concatenate([wx, wy], axis=3))
            kernel = jnp.concatenate(blocks, axis=2)  # (k,k,4cin,2cout)
        else:
            blocks = []
            for n in group:
                inner = []
                for m in group:
                    i = (n - m) % 4
                    inner.append(rot2(ws[i], n))
                blocks.append(jnp.concatenate(inner, axis=2))
            kernel = jnp.concatenate(blocks, axis=3)  # (k,k,4cin,4cout)

        # Circular padding + valid conv
        ph, pw = kh // 2, kw // 2
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="wrap")
        y = jax.lax.conv_general_dilated(
            xp,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.cout,), self.dtype
            )
            rep = 2 if self.isprojecting else 4
            y = y + jnp.tile(bias, rep)
        return self.activation(y)


class GCNN(nn.Module):
    radii: tuple
    channels: tuple
    activations: tuple
    use_bias: tuple
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = collocate(x)
        nlayer = len(self.radii)
        c = (1,) + tuple(self.channels)
        for i in range(nlayer):
            x = GroupConv2D(
                kernel_size=(2 * self.radii[i] + 1,) * 2,
                cin=c[i],
                cout=c[i + 1],
                activation=self.activations[i],
                islifting=(i == 0),
                isprojecting=(i == nlayer - 1),
                use_bias=self.use_bias[i],
                dtype=self.dtype,
            )(x)
        return decollocate(x)


def gcnn(*, setup, radii, channels, activations, use_bias, rng):
    """Build `(closure, theta)` (reference gcnn, groupconv.jl:262-294).
    2D only; channels count rotation-state multiplets (last must be 1,
    projecting to a single vector field)."""
    g = setup.grid
    assert g.dim == 2, "gcnn is 2D only"
    n = tuple(e - s for (s, e) in g.Iu[0])
    model = GCNN(
        radii=tuple(radii),
        channels=tuple(channels),
        activations=tuple(activations),
        use_bias=tuple(use_bias),
        dtype=setup.dtype,
    )
    return create_closure(model, rng=rng, sample_shape=(*n, 2), dtype=setup.dtype)
