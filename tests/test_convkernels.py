"""Pallas closure-conv kernels (ops/convkernels.py): tap-matmul and
pack-tile formulations vs an einsum reference, forward + custom VJP
(interpreter mode; TPU throughput exercised by benchmarks/conv_probe.py).

These kernels implement the closure CNN's conv layers (reference
lib/NeuralClosure/src/cnn.jl:5-48) with z-taps pre-folded into lane-dense
channels; the (dx, dy) taps are row offsets of the collapsed plane view.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ins_tpu.ops.convkernels import (
    lanes,
    make_conv_layer,
    packconv_3d,
    tapconv_3d,
    tapconv_wgrad_3d,
)


def _ref_tapconv(g, w2, bias=None, act=None):
    """out[x,y,z,:] = act(sum_{dx,dy} g[x+dx, y+dy, z, :] @ w2[dx,dy] + b)."""
    kx, ky, kc, cout = w2.shape
    nxp, nyp, nz, _ = g.shape
    nx, ny = nxp - kx + 1, nyp - ky + 1
    out = jnp.zeros((nx, ny, nz, cout), jnp.float32)
    for dx in range(kx):
        for dy in range(ky):
            blk = g[dx : dx + nx, dy : dy + ny].astype(jnp.float32)
            out = out + jnp.einsum(
                "xyzc,co->xyzo", blk, w2[dx, dy].astype(jnp.float32)
            )
    if bias is not None:
        out = out + bias
    if act is not None:
        out = act(out)
    return out


def _mk(nx=5, ny=6, nz=128, cin=24, cout=24, kx=3, ky=3, seed=0):
    rng = np.random.default_rng(seed)
    kc = lanes(cin)
    g = np.zeros((nx + kx - 1, ny + ky - 1, nz, kc), np.float32)
    g[..., :cin] = rng.standard_normal((nx + kx - 1, ny + ky - 1, nz, cin))
    w2 = np.zeros((kx, ky, kc, cout), np.float32)
    w2[:, :, :cin] = 0.3 * rng.standard_normal((kx, ky, cin, cout))
    b = 0.1 * rng.standard_normal((cout,)).astype(np.float32)
    return jnp.asarray(g), jnp.asarray(w2), jnp.asarray(b)


def test_tapconv_matches_einsum():
    g, w2, b = _mk()
    out = tapconv_3d(g, w2, b, jnp.tanh, interpret=True)
    ref = _ref_tapconv(g, w2, b, jnp.tanh)
    cout = w2.shape[-1]
    assert out.shape[-1] == lanes(cout)
    np.testing.assert_allclose(out[..., :cout], ref, rtol=0, atol=1e-5)
    # trailing lanes are act(0)
    np.testing.assert_allclose(out[..., cout:], 0.0, atol=1e-7)


def test_tapconv_no_bias_no_act():
    g, w2, _ = _mk(nx=4, ny=4, cin=8, cout=128, seed=1)
    out = tapconv_3d(g, w2, interpret=True)
    ref = _ref_tapconv(g, w2)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_tapconv_wgrad_matches_einsum():
    g, w2, _ = _mk(seed=2)
    kx, ky, kc, cout = w2.shape
    nx, ny = g.shape[0] - kx + 1, g.shape[1] - ky + 1
    rng = np.random.default_rng(3)
    ct = jnp.asarray(
        rng.standard_normal((nx, ny, g.shape[2], lanes(cout))), jnp.float32
    )
    dw = tapconv_wgrad_3d(g, ct, kx, ky, interpret=True)
    # dW[dx,dy,c,o] = sum_{x,y,z} g[x+dx, y+dy, z, c] ct[x, y, z, o]
    ref = np.zeros((kx, ky, kc, lanes(cout)), np.float32)
    for dx in range(kx):
        for dy in range(ky):
            ref[dx, dy] = jnp.einsum(
                "xyzc,xyzo->co", g[dx : dx + nx, dy : dy + ny], ct
            )
    np.testing.assert_allclose(dw, ref, rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize(
    "actname,has_bias,pack",
    [("tanh", True, False), ("id", False, False), ("tanh", True, True)],
)
def test_conv_layer_vjp(actname, has_bias, pack):
    g, w2, b = _mk(nx=4, ny=5, cin=16, cout=8, seed=4)
    act = {"tanh": jnp.tanh, "id": None}[actname]
    cout = w2.shape[-1]
    layer = make_conv_layer(actname, has_bias, interpret=True, pack=pack)

    def f_pl(g, w2, b):
        y = layer(g, w2, b)
        return jnp.sum(jnp.sin(y[..., :cout]))

    def f_ref(g, w2, b):
        y = _ref_tapconv(g, w2, b if has_bias else None, act)
        return jnp.sum(jnp.sin(y))

    v_pl, grads_pl = jax.value_and_grad(f_pl, argnums=(0, 1, 2))(g, w2, b)
    v_rf, grads_rf = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(g, w2, b)
    assert abs(float(v_pl - v_rf)) < 1e-3 * max(1.0, abs(float(v_rf)))
    names = ("dg", "dw", "db")
    for name, a, r in zip(names, grads_pl, grads_rf):
        if name == "db" and not has_bias:
            np.testing.assert_allclose(a, 0.0, atol=1e-7)
            continue
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        assert (
            float(jnp.max(jnp.abs(a - r))) < 2e-4 * scale
        ), f"{name} mismatch"


@pytest.mark.parametrize(
    "cin,cout,kx,ky",
    [
        (24, 24, 3, 3),  # per-dx tiles (ky*cout=72 <= 128 < kx*ky*cout)
        (16, 8, 3, 3),  # fully packed single tile (kx*ky*cout=72 <= 128)
    ],
)
def test_packconv_matches_tapconv(cin, cout, kx, ky):
    g, w2, b = _mk(nx=4, ny=6, cin=cin, cout=cout, kx=kx, ky=ky, seed=5)
    out_t = tapconv_3d(g, w2, b, jnp.tanh, interpret=True)
    out_p = packconv_3d(g, w2, b, jnp.tanh, interpret=True)
    assert out_p.shape[-1] == 128
    np.testing.assert_allclose(
        out_p[..., :cout], out_t[..., :cout], rtol=0, atol=1e-5
    )


def test_packconv_strips():
    """ny split into strips (nys < ny) recomputes the overlap correctly."""
    g, w2, b = _mk(nx=4, ny=6, cin=8, cout=8, seed=6)
    out_full = packconv_3d(g, w2, b, None, nys=6, interpret=True)
    out_strip = packconv_3d(g, w2, b, None, nys=3, interpret=True)
    np.testing.assert_allclose(out_strip, out_full, rtol=0, atol=1e-6)


def test_cnn_pallas_path_matches_xla():
    """CNN closure with pallas=True (interpret, fused-fold kernels) ==
    XLA fold path: values and parameter gradients (the production
    a-posteriori config routes through this path on TPU; reference
    cnn.jl:5-48)."""
    import flax
    from ins_tpu.models.cnn import CNN

    kw = dict(
        radii=(1, 1),
        channels=(8, 3),
        activations=(jnp.tanh, lambda x: x),
        use_bias=(True, False),
        dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    mp = CNN(pallas=True, **kw)
    mx = CNN(pallas=False, **kw)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 32, 3)), jnp.float32)
    theta = mp.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m, th):
        return jnp.sum(m.apply({"params": th}, x) ** 2)

    vp, gp = jax.value_and_grad(lambda th: loss(mp, th))(theta)
    vx, gx = jax.value_and_grad(lambda th: loss(mx, th))(theta)
    assert abs(float(vp - vx)) < 1e-4 * max(1.0, abs(float(vx)))
    flat_p = flax.traverse_util.flatten_dict(gp)
    flat_x = flax.traverse_util.flatten_dict(gx)
    for k in flat_x:
        scale = max(1.0, float(jnp.max(jnp.abs(flat_x[k]))))
        d = float(jnp.max(jnp.abs(flat_p[k] - flat_x[k])))
        assert d < 2e-4 * scale, (k, d, scale)


def test_cnn_pallas_batched():
    """Batched (lax.map) Pallas evaluation agrees with per-sample; the
    fused path never x-chunks (kernels stream planes)."""
    from ins_tpu.models.cnn import CNN

    kw = dict(
        radii=(1,),
        channels=(3,),
        activations=(jnp.tanh,),
        use_bias=(True,),
        dtype=jnp.float32,
        compute_dtype=jnp.float32,
        pallas=True,
    )
    m = CNN(**kw)
    # chunk thresholds met, but fused path must skip chunking
    mc = CNN(chunk_min_nx=8, chunk_x=4, **kw)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 32, 3)), jnp.float32)
    theta = m.init(jax.random.PRNGKey(1), x)["params"]
    y = m.apply({"params": theta}, x)
    y1 = m.apply({"params": theta}, x[:1])
    yc = mc.apply({"params": theta}, x)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[:1]), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(y), atol=1e-5)


# ---------------------------------------------------------------------------
# Fused-fold kernels (no XLA-side fold; periodic in x, y, z)
# ---------------------------------------------------------------------------


def _ref_periodic_conv(h, w, bias=None, act=None):
    """out[x,y,z,o] = act(sum_{dx,dy,dz,c} h[x+dx-r, y+dy-r, z+dz-r, c]
    * w[dx,dy,dz,c,o] + b) with circular wrap (reference cnn.jl conv)."""
    k = w.shape[0]
    r = k // 2
    cin, cout = w.shape[3], w.shape[4]
    out = 0.0
    for dx in range(k):
        for dy in range(k):
            for dz in range(k):
                hs = jnp.roll(h[..., :cin],
                              (r - dx, r - dy, r - dz), axis=(0, 1, 2))
                out = out + jnp.einsum(
                    "xyzc,co->xyzo", hs.astype(jnp.float32),
                    w[dx, dy, dz].astype(jnp.float32))
    if bias is not None:
        out = out + bias
    if act is not None:
        out = act(out)
    return out


def _mk_fused(nx=6, ny=8, nz=16, cin=5, cout=7, k=3, seed=0):
    rng = np.random.default_rng(seed)
    h = np.zeros((nx, ny, nz, 128), np.float32)
    h[..., :cin] = rng.standard_normal((nx, ny, nz, cin))
    # garbage beyond cin must be ignored
    h[..., cin:] = 1e3 * rng.standard_normal((nx, ny, nz, 128 - cin))
    w = 0.3 * rng.standard_normal((k, k, k, cin, cout)).astype(np.float32)
    b = 0.1 * rng.standard_normal((cout,)).astype(np.float32)
    return jnp.asarray(h), jnp.asarray(w), jnp.asarray(b)


@pytest.mark.parametrize("nys", [None, 4])
def test_fusedconv_matches_reference(nys):
    from ins_tpu.ops.convkernels import fusedconv_3d, pack_ws

    h, w, b = _mk_fused()
    cin, cout, k = 5, 7, 3
    ws = pack_ws(w, jnp.float32)
    out = fusedconv_3d(h, ws, b, jnp.tanh, cin=cin, cout=cout, k=k,
                       nys=nys, interpret=True)
    ref = _ref_periodic_conv(h, w, b, jnp.tanh)
    assert out.shape == (*h.shape[:3], 128)
    np.testing.assert_allclose(out[..., :cout], ref, rtol=0, atol=1e-5)


def test_fusedconv_wgrad_matches_reference():
    from ins_tpu.ops.convkernels import (
        fusedconv_wgrad_3d,
        unpack_dws,
    )

    h, w, b = _mk_fused(seed=3)
    cin, cout, k = 5, 7, 3
    rng = np.random.default_rng(4)
    ct = np.zeros((*h.shape[:3], 128), np.float32)
    ct[..., :cout] = rng.standard_normal((*h.shape[:3], cout))
    ct = jnp.asarray(ct)
    dws = fusedconv_wgrad_3d(h, ct, cin=cin, cout=cout, k=k, nys=4,
                             interpret=True)
    dw = unpack_dws(dws, k, k, k, cin, cout)

    def f(w):
        return jnp.sum(_ref_periodic_conv(h, w) * ct[..., :cout])

    dw_ref = jax.grad(f)(w)
    np.testing.assert_allclose(dw, dw_ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("actname,has_bias", [("tanh", True), ("id", False)])
def test_fused_layer_vjp(actname, has_bias):
    from ins_tpu.ops.convkernels import make_fused_layer

    h, w, b = _mk_fused(seed=5)
    # zero the garbage lanes for the grad test: dL/dh of the reference
    # is only defined on the cin live lanes
    h = h.at[..., 5:].set(0.0)
    cin, cout, k = 5, 7, 3
    act = {"tanh": jnp.tanh, "id": None}[actname]
    layer = make_fused_layer(actname, has_bias, cin=cin, cout=cout, k=k,
                             interpret=True)

    def f_pl(h, w, b):
        y = layer(h, w, b)
        return jnp.sum(jnp.sin(y[..., :cout]))

    def f_ref(h, w, b):
        y = _ref_periodic_conv(h, w, b if has_bias else None, act)
        return jnp.sum(jnp.sin(y))

    v_pl, g_pl = jax.value_and_grad(f_pl, argnums=(0, 1, 2))(h, w, b)
    v_rf, g_rf = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(h, w, b)
    assert abs(float(v_pl - v_rf)) < 1e-3 * max(1.0, abs(float(v_rf)))
    # dh: reference grad lives on lanes < cin; pallas dh lanes >= cin
    # are garbage by contract
    scale = max(1.0, float(jnp.max(jnp.abs(g_rf[0]))))
    dh_err = float(jnp.max(jnp.abs(g_pl[0][..., :cin] - g_rf[0][..., :cin])))
    assert dh_err < 2e-4 * scale, dh_err
    scale = max(1.0, float(jnp.max(jnp.abs(g_rf[1]))))
    assert float(jnp.max(jnp.abs(g_pl[1] - g_rf[1]))) < 2e-4 * scale
    if has_bias:
        scale = max(1.0, float(jnp.max(jnp.abs(g_rf[2]))))
        assert float(jnp.max(jnp.abs(g_pl[2] - g_rf[2]))) < 2e-4 * scale
