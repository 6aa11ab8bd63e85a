"""Native C++ runtime library: base64 codec + async writer."""

import base64
import os
import struct

import numpy as np
import pytest

from ins_tpu.utils.native import AsyncWriter, b64_vtk, native_available


def test_native_builds():
    # g++ is in the image; the library must build and load
    assert native_available()


def test_b64_matches_python():
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 3, 100, 4097):
        arr = rng.standard_normal(n).astype(np.float32)
        raw = arr.tobytes()
        expect = base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()
        assert b64_vtk(arr) == expect, n


def test_async_writer(tmp_path):
    w = AsyncWriter(nthreads=2)
    paths = []
    for i in range(20):
        p = str(tmp_path / f"f{i}.bin")
        w.submit(p, bytes([i]) * (1000 + i))
        paths.append(p)
    w.flush()
    for i, p in enumerate(paths):
        data = open(p, "rb").read()
        assert data == bytes([i]) * (1000 + i)
    w.close()


def test_vtk_writer_uses_async(tmp_path):
    import jax
    import jax.numpy as jnp

    import ins_tpu as ins

    n = 16
    x = (np.linspace(0, 2 * np.pi, n + 1),) * 2
    bc = ((ins.PeriodicBC(), ins.PeriodicBC()),) * 2
    setup = ins.Setup(x=x, boundary_conditions=bc, dtype=jnp.float64)
    ps = ins.psolver_spectral(setup)
    u0 = ins.random_field(setup, kp=3, rng=jax.random.PRNGKey(0))
    _, out = ins.solve_unsteady(
        setup=setup, ustart=u0, tlims=(0, 0.02), dt=1e-2, psolver=ps,
        processors={
            "vtk": ins.vtk_writer(
                setup=setup, nupdate=1, dir=str(tmp_path), psolver=ps
            )
        },
    )
    assert os.path.exists(out["vtk"])
    vtrs = [f for f in os.listdir(tmp_path) if f.endswith(".vtr")]
    assert len(vtrs) == 3
    # Files fully written (flush happened)
    import xml.etree.ElementTree as ET

    for f in vtrs:
        ET.parse(tmp_path / f)
