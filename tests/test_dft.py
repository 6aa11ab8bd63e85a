"""ops/dft.py: TPU-safe transforms + MXU Poisson solve.

Context (measured on TPU v5e, recorded here because CI runs on CPU):
XLA's *fused* multi-axis TPU FFT loses precision catastrophically at
3D 256^3 (roundtrip rel err 0.33); per-axis 1-D transforms and the
Precision.HIGHEST eigen-matmul solve stay at f32 accuracy. These tests
pin the math of both replacements against the fused FFT on CPU (exact
there), so any formulation drift is caught even without a TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ins_tpu as ins
from ins_tpu.ops import dft


@pytest.mark.parametrize("shape", [(16, 16), (8, 12, 16)])
def test_fftn_wrappers_match_fused(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape))
    # force the per-axis decomposition (backend_is_cpu gate would bypass)
    per_axis = x.astype(jnp.complex128)
    for ax in range(len(shape)):
        per_axis = jnp.fft.fft(per_axis, axis=ax)
    fused = jnp.fft.fftn(x)
    assert jnp.allclose(per_axis, fused, atol=1e-12)
    # module wrappers on CPU delegate to the fused kernels
    assert jnp.allclose(dft.fftn(x), fused, atol=1e-12)
    assert jnp.allclose(
        dft.irfftn(dft.rfftn(x), shape), x, atol=1e-12
    )


@pytest.mark.parametrize("n", [8, 9, 16])
def test_fourier_eigenbasis_diagonalizes(n):
    dx = 0.37
    V, Vinv, lam = dft.fourier_eigenbasis(n, dx)
    # delta-orthonormality: V^T diag(dx) V = I
    assert np.allclose(Vinv @ V, np.eye(n), atol=1e-12)
    # diagonalizes the periodic second difference (1,-2,1)/dx^2
    T = np.zeros((n, n))
    for i in range(n):
        T[i, i] = -2.0
        T[i, (i - 1) % n] += 1.0
        T[i, (i + 1) % n] += 1.0
    T /= dx**2
    assert np.allclose(Vinv @ T @ V, np.diag(lam), atol=1e-9)


@pytest.mark.parametrize("Np,dxs", [((16, 16, 16), (0.1, 0.1, 0.1)),
                                    ((12, 16), (0.2, 0.15))])
def test_poisson_mm_matches_fft(Np, dxs):
    D = len(Np)
    vol = float(np.prod(dxs))
    rng = np.random.default_rng(1)
    f = rng.standard_normal(Np)
    f -= f.mean()

    solve = dft.make_poisson_mm(Np, dxs, jnp.float64)
    p_mm = np.asarray(solve(jnp.asarray(f)))

    kmax = tuple(Np[d] // 2 + 1 if d == D - 1 else Np[d] for d in range(D))
    den = np.zeros(kmax)
    for d in range(D):
        k = np.arange(kmax[d])
        den += (4 * vol * np.sin(np.pi * k / Np[d]) ** 2 / dxs[d] ** 2).reshape(
            [-1 if i == d else 1 for i in range(D)]
        )
    den[(0,) * D] = 1.0
    inv = -1.0 / den
    inv[(0,) * D] = 0.0
    p_fft = np.fft.irfftn(
        np.fft.rfftn(f) * inv, f.shape, axes=tuple(range(D))
    )
    assert np.linalg.norm(p_mm - p_fft) / np.linalg.norm(p_fft) < 1e-10

    # and it actually solves L p = f (vol-scaled Laplacian)
    lap = np.zeros_like(f)
    for d in range(D):
        lap += (np.roll(p_mm, -1, d) - 2 * p_mm + np.roll(p_mm, 1, d)) * (
            vol / dxs[d] ** 2
        )
    assert np.linalg.norm(lap - f) / np.linalg.norm(f) < 1e-9


def test_fastpath_project_mm_equals_fft():
    """The fast-path projection with the matmul solve must reproduce the
    FFT projection bit-for-bit-ish (f64 on CPU)."""
    import ins_tpu.ops.fastpath as fp

    n = 16
    x = tuple(np.linspace(0.0, 2 * np.pi, n + 1) for _ in range(3))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 3
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=1000.0,
                      dtype=jnp.float64)
    method = ins.RKMethods.RK44()

    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(0))
    ui = fp.strip_ghosts(u0)
    from ins_tpu.time_steppers.step import StepperState

    s0 = StepperState(u=ui, temp=None, t=jnp.asarray(0.0, jnp.float64),
                      n=jnp.asarray(0))

    step_fft = fp.make_fast_timestep(setup, method)
    out_fft = step_fft(s0, 1e-3, None)

    # monkey-patch the gate so the same builder emits the matmul solve
    orig = dft.backend_is_cpu
    dft.backend_is_cpu = lambda: False
    try:
        step_mm = fp.make_fast_timestep(setup, method)
    finally:
        dft.backend_is_cpu = orig
    out_mm = step_mm(s0, 1e-3, None)

    err = float(jnp.linalg.norm(out_mm.u - out_fft.u)
                / jnp.linalg.norm(out_fft.u))
    assert err < 1e-12


def test_psolver_spectral_mm_gate():
    """psolver_spectral emits the matmul solve on non-CPU backends and it
    matches the FFT solve."""
    from ins_tpu.ops import pressure as pr

    n = 16
    x = tuple(np.linspace(0.0, 1.0, n + 1) for _ in range(2))
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, Re=100.0,
                      dtype=jnp.float64)
    ps_fft = ins.psolver_spectral(setup)

    orig = dft.backend_is_cpu
    dft.backend_is_cpu = lambda: False
    try:
        ps_mm = ins.psolver_spectral(setup)
    finally:
        dft.backend_is_cpu = orig

    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal(setup.grid.N))
    a, b = ps_fft(p), ps_mm(p)
    # compare up to the (nullspace) constant
    from ins_tpu.ops._stencil import slc

    ip = slc(setup.grid.Ip)
    da = a[ip] - jnp.mean(a[ip])
    db = b[ip] - jnp.mean(b[ip])
    assert float(jnp.linalg.norm(da - db) / jnp.linalg.norm(da)) < 1e-10
