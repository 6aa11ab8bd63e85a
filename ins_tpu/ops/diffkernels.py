"""Differentiable (custom-VJP) wrappers around the fast-path Pallas kernels.

The hot kernels in `pallas_kernels.py` are raw ``pallas_call``s, which JAX
cannot differentiate — so until now every a-posteriori training unroll fell
back to the ghosted slice graph.  The reference solves the same problem by
hand-writing adjoints for exactly these hot operators (convection adjoint
src/operators.jl:429-519 and the Enzyme rules src/operators.jl:1621-1910).
The TPU-native equivalent here: each kernel keeps its fused Pallas forward
and gets a ``jax.custom_vjp`` whose backward is the exact adjoint of the
kernel's roll-graph twin —

- **linear kernels** (``stage_div_3d``, ``pressure_correct_3d``): the
  adjoint is hand-derived and is itself a tiny roll graph (the divergence
  and gradient stencils transpose into each other, D = -Gᵀ);
- **nonlinear kernels** (``convdiff_interior_3d``,
  ``smagorinsky_force_3d``): backward is ``jax.vjp`` of the roll twin,
  recomputing the linearization point from the saved primal inputs
  (residual = inputs, i.e. rematerialization — which is also what
  ``jax.checkpoint``-wrapped training unrolls want).

The roll twins are bit-compatible with the kernels to f32 rounding (the
kernel test oracles in tests/test_pallas_kernel.py), so the VJPs are the
true adjoints of the forward math, not approximations.

`convdiff_roll` / `divergence_adjoint` also serve as the single shared
definition of the periodic-uniform roll-graph momentum math for
`ops/fastpath.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convdiff_roll",
    "make_convdiff_vjp",
    "make_stage_div_vjp",
    "make_pressure_correct_vjp",
    "make_smag_force_vjp",
]


def _roll_p(v, d):  # v[I + e_d]
    return jnp.roll(v, -1, axis=d)


def _roll_m(v, d):  # v[I - e_d]
    return jnp.roll(v, 1, axis=d)


def convdiff_roll(u, visc, dxs):
    """Convection + diffusion on ghost-free periodic-uniform interior
    fields (any D) as a pure roll graph — the differentiable twin of the
    fused Pallas kernel `convdiff_interior_3d` (reference
    convectiondiffusion!, src/operators.jl:590-680, uniform periodic
    case where all interpolation weights are 1/2)."""
    D = u.shape[0]
    F = []
    for a in range(D):
        ua = u[a]
        f = 0.0
        for b in range(D):
            upb, umb = _roll_p(ua, b), _roll_m(ua, b)
            f = f + (visc / dxs[b] ** 2) * (upb - 2.0 * ua + umb)
            uab1 = 0.5 * (umb + ua)
            uab2 = 0.5 * (ua + upb)
            if a == b:
                uba1, uba2 = uab1, uab2
            else:
                ub = u[b]
                ub_pa = _roll_p(ub, a)
                uba1 = 0.5 * (_roll_m(ub, b) + _roll_m(ub_pa, b))
                uba2 = 0.5 * (ub + ub_pa)
            f = f - (uab2 * uba2 - uab1 * uba1) / dxs[b]
        F.append(f)
    return jnp.stack(F)


def make_convdiff_vjp(visc, dxs, *, interpret=False):
    """`convdiff_interior_3d` with a custom VJP: Pallas forward,
    roll-twin adjoint backward (linearized at the saved input)."""
    from .pallas_kernels import convdiff_interior_3d

    visc = float(visc)
    dxs = tuple(map(float, dxs))

    @jax.custom_vjp
    def f(u):
        return convdiff_interior_3d(u, visc, dxs, interpret=interpret)

    def fwd(u):
        return f(u), u

    def bwd(u, ct):
        _, vjp = jax.vjp(lambda v: convdiff_roll(v, visc, dxs), u)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def make_stage_div_vjp(dxs, *, interpret=False):
    """`stage_div_3d` with a custom VJP.  The map is linear:
    ``ut = base + coeff*k``, ``div = vol * Σ_a (ut_a - ut_a[I-e_a])/dx_a``;
    its adjoint sends the divergence cotangent back through the
    transposed stencil ``vol * (w - w[I+e_a])/dx_a`` (Dᵀ = -G) and
    scales the k cotangent by ``coeff``."""
    from .pallas_kernels import stage_div_3d

    dxs = tuple(map(float, dxs))
    vol = float(np.prod(dxs))

    @jax.custom_vjp
    def f(base, k, coeff):
        return stage_div_3d(base, k, coeff, dxs, interpret=interpret)

    def fwd(base, k, coeff):
        return f(base, k, coeff), (k, coeff)

    def bwd(res, cts):
        k, coeff = res
        ct_ut, ct_div = cts
        g = ct_ut + jnp.stack(
            [vol * (ct_div - _roll_p(ct_div, a)) / dxs[a] for a in range(3)]
        )
        ct_coeff = jnp.sum(k * g).astype(jnp.asarray(coeff).dtype)
        return g, jnp.asarray(coeff) * g, ct_coeff.reshape(jnp.shape(coeff))

    f.defvjp(fwd, bwd)
    return f


def make_pressure_correct_vjp(dxs, *, interpret=False):
    """`pressure_correct_3d` with a custom VJP.  ``u = ut - G q`` is
    linear; the adjoint of the gradient stencil is minus the divergence
    stencil, so ``ct_q = Σ_a (ct_u_a - ct_u_a[I-e_a])/dx_a``."""
    from .pallas_kernels import pressure_correct_3d

    dxs = tuple(map(float, dxs))

    @jax.custom_vjp
    def f(ut, q):
        return pressure_correct_3d(ut, q, dxs, interpret=interpret)

    def fwd(ut, q):
        return f(ut, q), None

    def bwd(_, ct):
        ct_q = sum((ct[a] - _roll_m(ct[a], a)) / dxs[a] for a in range(3))
        return ct, ct_q

    f.defvjp(fwd, bwd)
    return f


def make_smag_force_vjp(dxs, *, bodyforce=None, interpret=False):
    """`smagorinsky_force_3d` with a custom VJP: Pallas forward (with an
    optional steady body force folded in), backward via `jax.vjp` of the
    roll twin `smagorinsky_natural_interior` (the additive constant body
    force drops out of the adjoint).  Differentiable in both `u` and
    `theta` — the reference trains the Smagorinsky constant a-posteriori
    through exactly this operator (lib/NeuralClosure training.jl)."""
    from .eddyviscosity import smagorinsky_natural_interior
    from .pallas_kernels import smagorinsky_force_3d

    dxs = tuple(map(float, dxs))

    @jax.custom_vjp
    def f(u, theta):
        return smagorinsky_force_3d(
            u, theta, dxs, bodyforce=bodyforce, interpret=interpret
        )

    def fwd(u, theta):
        return f(u, theta), (u, theta)

    def bwd(res, ct):
        u, theta = res
        _, vjp = jax.vjp(
            lambda v, th: smagorinsky_natural_interior(v, th, dxs), u, theta
        )
        gu, gth = vjp(ct)
        return gu, gth.reshape(jnp.shape(theta)).astype(
            jnp.asarray(theta).dtype
        )

    f.defvjp(fwd, bwd)
    return f
