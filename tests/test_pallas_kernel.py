"""Pallas fused convection-diffusion kernel: correctness in interpreter
mode (TPU execution exercised by bench/verify on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops.pallas_kernels import convdiff_periodic_uniform_3d


def test_convdiff_kernel_matches_slice_graph():
    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 3
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1e3, dtype=jnp.float32)
    u = ins.random_field(setup, kp=4, rng=jax.random.PRNGKey(0))
    F_ref = ins.convectiondiffusion(u, setup)
    dx = [float(np.asarray(setup.grid.delta[d])[0]) for d in range(3)]
    F_pl = convdiff_periodic_uniform_3d(u, 1e-3, dx, interpret=True)
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F_ref - F_pl))) < 1e-5 * max(scale, 1.0)


def test_stage_div_kernel_matches_rolls():
    """stage_div_3d: fused axpy+divergence == roll-graph reference."""
    from ins_tpu.ops.pallas_kernels import stage_div_3d

    n = 16
    dx = (2 * np.pi / n, 1.0 / n, 0.5 / n)
    vol = float(np.prod(dx))
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    coeff = jnp.float32(0.37)
    ut, dv = stage_div_3d(base, k, coeff, dx, interpret=True)
    ut_ref = base + 0.37 * k
    dv_ref = (
        sum((ut_ref[a] - jnp.roll(ut_ref[a], 1, a)) / dx[a] for a in range(3))
        * vol
    )
    assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(dv - dv_ref))) < 1e-4


def test_momentum_stage_div_kernel_matches_parts():
    """momentum_stage_div_3d == convdiff + axpy + divergence rolls."""
    from ins_tpu.ops.pallas_kernels import (
        convdiff_interior_3d,
        momentum_stage_div_3d,
    )

    n = 16
    dx = (2 * np.pi / n, 1.0 / n, 0.5 / n)
    vol = float(np.prod(dx))
    visc = 1e-3
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    base = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    coeff = jnp.float32(0.21)
    k, ut, dv = momentum_stage_div_3d(
        u, base, coeff, visc, dx, interpret=True
    )
    k_ref = convdiff_interior_3d(u, visc, dx, interpret=True)
    ut_ref = base + 0.21 * k_ref
    dv_ref = (
        sum((ut_ref[a] - jnp.roll(ut_ref[a], 1, a)) / dx[a] for a in range(3))
        * vol
    )
    assert float(jnp.max(jnp.abs(k - k_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(dv - dv_ref))) < 1e-3


@pytest.mark.parametrize("precision", ["highest", "manualhigh"])
def test_poisson_pallas_matches_xla(precision):
    """3-pass Pallas Poisson == XLA 6-contraction fast-diagonalization."""
    from ins_tpu.ops.dft import make_poisson_mm
    from ins_tpu.ops.poisson_pallas import make_poisson_pallas

    n = 16
    dx = 2 * np.pi / n
    f = jax.random.normal(jax.random.PRNGKey(3), (n, n, n), jnp.float32)
    ref = make_poisson_mm((n,) * 3, (dx,) * 3, jnp.float32)(f)
    sol = make_poisson_pallas(
        (n,) * 3, (dx,) * 3, jnp.float32, precision=precision, interpret=True
    )(f)
    scale = float(jnp.max(jnp.abs(ref)))
    tol = 1e-5 if precision == "highest" else 5e-4
    assert float(jnp.max(jnp.abs(sol - ref))) < tol * max(scale, 1.0)


@pytest.mark.parametrize("precision", ["highest", "manualhigh"])
def test_fused_projection_chain_matches_unfused(precision):
    """msd_hat -> passB -> pc_qhat == stage_div -> full solve -> correct."""
    from ins_tpu.ops.dft import make_poisson_mm
    from ins_tpu.ops.pallas_kernels import (
        momentum_stage_div_3d,
        momentum_stage_divhat_3d,
        pressure_correct_3d,
        pressure_correct_qhat_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    base = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    coeff = jnp.float32(0.13)

    proj = make_fused_projection(
        (n,) * 3, dx, jnp.float32, precision=precision, interpret=True
    )
    k, ut, divhat = momentum_stage_divhat_3d(
        u, (base,), (coeff,), visc, dx, proj["Vinv"], proj["VinvT"],
        precision=precision, interpret=True,
    )
    qhat = proj["passB"](divhat)
    u_new = pressure_correct_qhat_3d(
        ut, qhat, dx, proj["V"], proj["VT"],
        precision=precision, interpret=True,
    )

    k_ref, ut_ref, div_ref = momentum_stage_div_3d(
        u, base, coeff, visc, dx, interpret=True
    )
    q_ref = make_poisson_mm((n,) * 3, dx, jnp.float32)(div_ref)
    u_ref = pressure_correct_3d(ut_ref, q_ref, dx, interpret=True)

    tol = 1e-4 if precision == "highest" else 2e-3
    assert float(jnp.max(jnp.abs(k - k_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(u_new - u_ref))) < tol * float(
        jnp.max(jnp.abs(u_ref))
    )


def test_momentum_stage_divhat_multistream():
    """In-kernel tableau accumulation over several streams == the XLA
    axpy followed by the single-stream form."""
    from ins_tpu.ops.pallas_kernels import momentum_stage_divhat_3d
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    c1, c2, cn = 0.3, -0.7, 0.11

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    k, ut, dh = momentum_stage_divhat_3d(
        u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
        proj["Vinv"], proj["VinvT"], interpret=True,
    )
    base = ustart + c1 * k1 + c2 * k2
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u, (base,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(k - k_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(dh - dh_ref))) < 1e-2

    # emit_k=False drops the k output; usnew_coeff appends ustart + c*k
    ut2, dh2, usnew = momentum_stage_divhat_3d(
        u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
        proj["Vinv"], proj["VinvT"], interpret=True,
        emit_k=False, usnew_coeff=0.5,
    )
    assert float(jnp.max(jnp.abs(ut2 - ut_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(usnew - (ustart + 0.5 * k_ref)))) < 1e-4


def test_momentum_stage_divhat_accbase_dedup_and_deep_carry():
    """New ring-carry kernel features: (a) a deep multi-window carry
    chain (bx=2 -> 8 windows) matches the single-window result, (b) the
    b-row accumulator stream (usnew = usnew_base + c*k), (c) stage-0
    stream dedup (streams[0] is u reads the base from the u window)."""
    from ins_tpu.ops.pallas_kernels import momentum_stage_divhat_3d
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    accb = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    cn = 0.21

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    kw = dict(interpret=True)
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"], **kw
    )

    # (a) deep carry chain: bx=2 forces 8 ring-carried windows
    k2, ut2, dh2 = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        bx=2, **kw,
    )
    assert float(jnp.max(jnp.abs(k2 - k_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(ut2 - ut_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(dh2 - dh_ref))) < 1e-3

    # (b) separate usnew base stream (the RK b-row accumulator)
    ut3, dh3, usnew = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        emit_k=False, usnew_coeff=0.5, usnew_base=accb, bx=2, **kw,
    )
    assert float(jnp.max(jnp.abs(ut3 - ut_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(usnew - (accb + 0.5 * k_ref)))) < 1e-4

    # (c) stage-0 dedup: streams[0] IS u (one fewer DMA stream) ==
    # passing an identical copy (separate stream)
    k4, ut4, dh4, usnew4 = momentum_stage_divhat_3d(
        u, (u,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        usnew_coeff=0.5, bx=2, **kw,
    )
    k5, ut5, dh5, usnew5 = momentum_stage_divhat_3d(
        u, (jnp.array(u),), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        usnew_coeff=0.5, bx=2, **kw,
    )
    assert float(jnp.max(jnp.abs(k4 - k5))) == 0.0
    assert float(jnp.max(jnp.abs(ut4 - ut5))) == 0.0
    assert float(jnp.max(jnp.abs(usnew4 - usnew5))) == 0.0
    assert float(jnp.max(jnp.abs(dh4 - dh5))) == 0.0


def test_momentum_stage_divhat_bodyforce():
    """A steady body force riding the kernel as an extra stream equals
    adding it to k outside."""
    from ins_tpu.ops.pallas_kernels import momentum_stage_divhat_3d
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    cn = 0.19

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    k, ut, dh = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True, bodyforce=bf,
    )
    k0, ut0, _ = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(k - (k0 + bf)))) < 1e-5
    assert float(jnp.max(jnp.abs(ut - (ut0 + cn * bf)))) < 1e-4


def test_momentum_stage_divhat_fused_smagorinsky():
    """Smagorinsky force fused INTO the stage kernel (widened u window,
    force computed in _stage_tail) == the separate force kernel feeding
    the bodyforce stream."""
    from ins_tpu.ops.pallas_kernels import (
        momentum_stage_divhat_3d,
        smagorinsky_force_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    theta = jnp.float32(0.17)
    d2 = float(sum(d * d for d in dx))
    rng = np.random.default_rng(13)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    cn = 0.23

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    F = smagorinsky_force_3d(u, theta, dx, interpret=True)
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        bodyforce=F, interpret=True,
    )
    for bx in (None, 2):
        k, ut, dh = momentum_stage_divhat_3d(
            u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
            smag=(theta, d2), interpret=True, bx=bx,
        )
        assert float(jnp.max(jnp.abs(k - k_ref))) < 1e-5
        assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-5
        assert float(jnp.max(jnp.abs(dh - dh_ref))) < 1e-3

    # with usnew and a steady body force riding alongside
    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ut2, dh2, usn = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        smag=(theta, d2), bodyforce=bf, emit_k=False, usnew_coeff=0.4,
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(ut2 - (ut_ref + cn * bf)))) < 1e-5
    assert float(
        jnp.max(jnp.abs(usn - (ustart + 0.4 * (k_ref + bf))))
    ) < 1e-4


def test_kernels_on_halo_padded_slabs():
    """The periodic slab kernels applied to a halo-padded x-slab (non-cube
    box) reproduce the periodic full-box result on the interior planes —
    the basis of the multichip halo path's per-shard kernel use (the
    modular-x wrap is only wrong on the discarded edge planes)."""
    from ins_tpu.ops.pallas_kernels import (
        convdiff_interior_3d,
        pressure_correct_3d,
        stage_div_3d,
    )

    n, l, i0 = 16, 4, 6
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    pad_idx = np.arange(i0 - 1, i0 + l + 1) % n

    F_ref = convdiff_interior_3d(u, visc, dx, interpret=True)
    F_loc = convdiff_interior_3d(
        u[:, pad_idx], visc, dx, interpret=True
    )[:, 1:-1]
    assert float(jnp.max(jnp.abs(F_loc - F_ref[:, i0 : i0 + l]))) < 1e-5

    ut_ref, dv_ref = stage_div_3d(u, k, 0.3, dx, interpret=True)
    ut_loc, dv_loc = stage_div_3d(
        u[:, pad_idx], k[:, pad_idx], 0.3, dx, interpret=True
    )
    assert float(
        jnp.max(jnp.abs(ut_loc[:, 1:-1] - ut_ref[:, i0 : i0 + l]))
    ) < 1e-5
    assert float(
        jnp.max(jnp.abs(dv_loc[1:-1] - dv_ref[i0 : i0 + l]))
    ) < 1e-4

    un_ref = pressure_correct_3d(u, q, dx, interpret=True)
    un_loc = pressure_correct_3d(
        u[:, pad_idx], q[pad_idx], dx, interpret=True
    )[:, 1:-1]
    assert float(jnp.max(jnp.abs(un_loc - un_ref[:, i0 : i0 + l]))) < 1e-5


def test_pcmsd_matches_pc_then_msd():
    """Merged pc+msd kernel == pressure_correct_qhat followed by
    momentum_stage_divhat on the corrected velocity."""
    from ins_tpu.ops.pallas_kernels import (
        momentum_stage_divhat_3d,
        pcmsd_hat_3d,
        pressure_correct_qhat_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(6)
    ut_prev = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    qhat = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    c1, cn = 0.4, 0.17

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    k, ut, dh = pcmsd_hat_3d(
        ut_prev, qhat, (ustart, k1), (c1, cn), visc, dx, proj,
        interpret=True,
    )

    u_ref = pressure_correct_qhat_3d(
        ut_prev, qhat, dx, proj["V"], proj["VT"], interpret=True
    )
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u_ref, (ustart, k1), (c1, cn), visc, dx,
        proj["Vinv"], proj["VinvT"], interpret=True,
    )
    assert float(jnp.max(jnp.abs(k - k_ref))) < 1e-3
    assert float(jnp.max(jnp.abs(ut - ut_ref))) < 1e-3
    assert float(jnp.max(jnp.abs(dh - dh_ref))) < 5e-2

    # emit_k=False + usnew output
    ut2, dh2, usn = pcmsd_hat_3d(
        ut_prev, qhat, (ustart, k1), (c1, cn), visc, dx, proj,
        interpret=True, emit_k=False, usnew_coeff=0.25,
    )
    assert float(jnp.max(jnp.abs(ut2 - ut_ref))) < 1e-3
    assert float(jnp.max(jnp.abs(usn - (ustart + 0.25 * k_ref)))) < 1e-3

    # bodyforce stream + b-row accumulator stream (usnew_base), as used
    # by the merged production chain (fastpath step_merged)
    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    accb = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ut3, dh3, usn3 = pcmsd_hat_3d(
        ut_prev, qhat, (ustart, k1), (c1, cn), visc, dx, proj,
        interpret=True, emit_k=False, usnew_coeff=0.25,
        bodyforce=bf, usnew_base=accb,
    )
    assert float(jnp.max(jnp.abs(ut3 - (ut_ref + cn * bf)))) < 1e-3
    assert float(jnp.max(jnp.abs(usn3 - (accb + 0.25 * (k_ref + bf))))) < 1e-3


def test_pressure_correct_kernel_matches_rolls():
    """pressure_correct_3d: u = ut - grad(q) == roll-graph reference."""
    from ins_tpu.ops.pallas_kernels import pressure_correct_3d

    n = 16
    dx = (2 * np.pi / n, 1.0 / n, 0.5 / n)
    rng = np.random.default_rng(1)
    ut = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    u = pressure_correct_3d(ut, q, dx, interpret=True)
    G = jnp.stack([(jnp.roll(q, -1, a) - q) / dx[a] for a in range(3)])
    assert float(jnp.max(jnp.abs(u - (ut - G)))) < 1e-4


def test_smagorinsky_force_kernel_matches_roll_twin():
    """Fused Smagorinsky force kernel == roll-graph interior twin (which
    itself matches the ghosted natural closure to machine precision on
    periodic uniform grids — see test_les.py)."""
    from ins_tpu.ops.eddyviscosity import smagorinsky_natural_interior
    from ins_tpu.ops.pallas_kernels import smagorinsky_force_3d

    n = 16
    dx = (2 * np.pi / n, 1.0 / n, 0.5 / n)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    th = jnp.float32(0.17)
    ref = smagorinsky_natural_interior(u, th, dx)
    got = smagorinsky_force_3d(u, th, dx, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-6 * scale

    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    got2 = smagorinsky_force_3d(u, th, dx, bodyforce=bf, interpret=True)
    assert float(jnp.max(jnp.abs(ref + bf - got2))) < 1e-6 * scale


def test_momentum_stage_divhat_stream_accum():
    """Sequential stream accumulation (`_msd_hat_stream_kernel`) ==
    full-prefetch kernel, for every output combination (incl. a
    body-force stream and the LMWray3 usnew output)."""
    from ins_tpu.ops.pallas_kernels import momentum_stage_divhat_3d
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    c1, c2, cn = 0.3, -0.7, 0.11

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    for kwargs in (
        dict(),
        dict(bodyforce=bf),
        dict(emit_k=False),
        dict(emit_k=False, bodyforce=bf),
    ):
        ref = momentum_stage_divhat_3d(
            u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
            proj["Vinv"], proj["VinvT"], interpret=True,
            stream_accum=False, **kwargs,
        )
        got = momentum_stage_divhat_3d(
            u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
            proj["Vinv"], proj["VinvT"], interpret=True,
            stream_accum=True, **kwargs,
        )
        for a, b in zip(got, ref):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5, kwargs

    # LMWray3 shape: single stream + bf + usnew (acc == ustart)
    ref = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True, stream_accum=False,
        emit_k=False, usnew_coeff=0.5, bodyforce=bf,
    )
    got = momentum_stage_divhat_3d(
        u, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True, stream_accum=True,
        emit_k=False, usnew_coeff=0.5, bodyforce=bf,
    )
    for a, b in zip(got, ref):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5

    # bx=4 (several slabs) exercises the cross-slab ping-pong schedule
    ref = momentum_stage_divhat_3d(
        u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
        proj["Vinv"], proj["VinvT"], interpret=True, stream_accum=False,
        bx=4,
    )
    got = momentum_stage_divhat_3d(
        u, (ustart, k1, k2), (c1, c2, cn), visc, dx,
        proj["Vinv"], proj["VinvT"], interpret=True, stream_accum=True,
        bx=4,
    )
    for a, b in zip(got, ref):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5


@pytest.mark.parametrize("levels", [0, 1, 2])
def test_poisson_fold_recursion_levels(levels):
    """The recursive even-branch fold of pass B (each level's even
    half-basis IS the next level's eigenbasis / sqrt(2)) matches the
    dense eigen-matmul solve at every depth."""
    from ins_tpu.ops.dft import make_poisson_mm
    from ins_tpu.ops.poisson_pallas import make_poisson_pallas

    n = 16
    dx = (2 * np.pi / n,) * 3
    f = jax.random.normal(jax.random.PRNGKey(7), (n, n, n), jnp.float32)
    ref = make_poisson_mm((n,) * 3, (dx[0],) * 3, jnp.float32)(f)
    sol = make_poisson_pallas(
        (n,) * 3, dx, jnp.float32, precision="highest", interpret=True,
        fold_levels=levels,
    )(f)
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    assert float(jnp.max(jnp.abs(sol - ref))) < 2e-5 * scale


def test_pcmsd_fused_smagorinsky():
    """Smagorinsky fused into the MERGED pc+momentum kernel (force
    computed from the ring-carried reconstructed u window) == separate
    correction + force kernel + stage kernel."""
    from ins_tpu.ops.pallas_kernels import (
        momentum_stage_divhat_3d,
        pcmsd_hat_3d,
        pressure_correct_qhat_3d,
        smagorinsky_force_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    theta = jnp.float32(0.17)
    d2 = float(sum(d * d for d in dx))
    rng = np.random.default_rng(17)
    ut_prev = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    qhat = 0.1 * jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    ustart = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    accb = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    cn = 0.23

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    u_ref = pressure_correct_qhat_3d(
        ut_prev, qhat, dx, proj["V"], proj["VT"], interpret=True
    )
    F = smagorinsky_force_3d(u_ref, theta, dx, interpret=True)
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u_ref, (ustart,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        bodyforce=F, interpret=True,
    )
    for bx in (None, 4):
        ut2, dh2, usn = pcmsd_hat_3d(
            ut_prev, qhat, (ustart,), (cn,), visc, dx, proj,
            interpret=True, emit_k=False, usnew_coeff=0.4,
            usnew_base=accb, smag=(theta, d2), bx=bx,
        )
        assert float(jnp.max(jnp.abs(ut2 - ut_ref))) < 2e-3
        # k_ref already includes F (the bodyforce stream is part of k)
        assert float(jnp.max(jnp.abs(usn - (accb + 0.4 * k_ref)))) < 2e-3


def test_pcmsd_recon_base_and_emit_u():
    """Step-boundary merge: pcmsd with a RECON tableau base (the
    reconstructed u is the stage base — no ustart stream) + emit_u ==
    pressure_correct_qhat followed by momentum_stage_divhat on the
    corrected velocity with ustart = that velocity."""
    from ins_tpu.ops.pallas_kernels import (
        RECON,
        momentum_stage_divhat_3d,
        pcmsd_hat_3d,
        pressure_correct_qhat_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(23)
    ut_prev = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    qhat = 0.1 * jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    cn = 0.21

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    u_ref = pressure_correct_qhat_3d(
        ut_prev, qhat, dx, proj["V"], proj["VT"], interpret=True
    )
    k_ref, ut_ref, dh_ref = momentum_stage_divhat_3d(
        u_ref, (u_ref,), (cn,), visc, dx, proj["Vinv"], proj["VinvT"],
        interpret=True,
    )
    for bx in (None, 4):
        # RK44-style stage 0: usnew = recon + c*k, emit the recon
        ut2, dh2, usn, u_em = pcmsd_hat_3d(
            ut_prev, qhat, (RECON,), (cn,), visc, dx, proj,
            interpret=True, emit_k=False, usnew_coeff=0.4, emit_u=True,
            bx=bx,
        )
        assert float(jnp.max(jnp.abs(u_em - u_ref))) < 1e-4
        assert float(jnp.max(jnp.abs(ut2 - ut_ref))) < 1e-3
        assert float(jnp.max(jnp.abs(dh2 - dh_ref))) < 5e-2
        assert float(jnp.max(jnp.abs(usn - (u_ref + 0.4 * k_ref)))) < 1e-3

    # LMWray3-style stage 0: no emit_u, bodyforce stream rides along
    bf = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    ut3, dh3, usn3 = pcmsd_hat_3d(
        ut_prev, qhat, (RECON,), (cn,), visc, dx, proj,
        interpret=True, emit_k=False, usnew_coeff=0.4, bodyforce=bf,
    )
    assert float(jnp.max(jnp.abs(ut3 - (ut_ref + cn * bf)))) < 1e-3
    assert float(
        jnp.max(jnp.abs(usn3 - (u_ref + 0.4 * (k_ref + bf))))
    ) < 1e-3


def test_pcmsd_halo_recon_base_matches_single_chip():
    """The halo twin's RECON base + emit_u (the per-shard step-boundary
    merge building block): a single 'shard' covering the whole periodic
    domain, with wrap ghosts, must reproduce `pcmsd_hat_3d(RECON)`."""
    from ins_tpu.ops.pallas_kernels import (
        RECON,
        pcmsd_hat_3d,
        pcmsd_hat_halo_3d,
    )
    from ins_tpu.ops.poisson_pallas import make_fused_projection

    n = 16
    dx = (2 * np.pi / n,) * 3
    visc = 1e-3
    rng = np.random.default_rng(29)
    ut_prev = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    qhat = 0.1 * jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    cn = 0.21

    proj = make_fused_projection((n,) * 3, dx, jnp.float32, interpret=True)
    ut_ref, dh_ref, usn_ref, u_ref = pcmsd_hat_3d(
        ut_prev, qhat, (RECON,), (cn,), visc, dx, proj,
        interpret=True, emit_k=False, usnew_coeff=0.4, emit_u=True,
    )
    ng_lo, ng_hi = 2, 1
    ut_h, dh_h, usn_h, u_h = pcmsd_hat_halo_3d(
        ut_prev, ut_prev[:, -ng_lo:], ut_prev[:, :ng_hi],
        qhat, qhat[-ng_lo:], qhat[: ng_hi + 1],
        (RECON,), (RECON,), (cn,), visc, dx, proj,
        interpret=True, emit_k=False, usnew_coeff=0.4, emit_u=True,
    )
    assert float(jnp.max(jnp.abs(u_h - u_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(ut_h - ut_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(dh_h - dh_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(usn_h - usn_ref))) < 1e-5
