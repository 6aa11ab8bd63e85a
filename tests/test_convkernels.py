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
    """CNN closure with pallas=True (interpret) == XLA fold path: values
    and parameter gradients (the production a-posteriori config routes
    through this path on TPU; reference cnn.jl:5-48)."""
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
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 128, 3)), jnp.float32)
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


def test_cnn_pallas_batched_and_chunked():
    """Batched (lax.map) and x-chunked Pallas evaluation agree with the
    direct path."""
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
    mc = CNN(chunk_min_nx=8, chunk_x=4, **kw)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 128, 3)), jnp.float32)
    theta = m.init(jax.random.PRNGKey(1), x)["params"]
    y = m.apply({"params": theta}, x)
    yc = mc.apply({"params": theta}, x)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(yc), np.asarray(y), atol=1e-5)
