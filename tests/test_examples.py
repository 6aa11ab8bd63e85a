"""Smoke-run every example case in quick mode (the reference ships its 20
flow cases as runnable scripts; here each exposes `run(quick=True)`)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

CASES = [
    "taylor_green_vortex_2d",
    "taylor_green_vortex_3d",
    "decaying_turbulence_2d",
    "decaying_turbulence_3d",
    "kolmogorov_2d",
    "shear_layer_2d",
    "plane_jets_2d",
    "planar_mixing_2d",
    "lid_driven_cavity_2d",
    "lid_driven_cavity_3d",
    "actuator_2d",
    "actuator_3d",
    "multi_actuator_2d",
    "backward_facing_step_2d",
    "backward_facing_step_3d",
    "rayleigh_benard_2d",
    "rayleigh_benard_3d",
    "rayleigh_taylor_2d",
    "rayleigh_taylor_3d",
    "turbulent_channel_3d",
    "les_smagorinsky_2d",
    "neural_closure_training",
    "production_turbulence_3d",
]


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES_DIR, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", CASES)
def test_example_quick(name):
    mod = _load(name)
    out = mod.run(quick=True)
    assert out is not None
    # All examples report finiteness or a physical check
    for key in ("finite", "decaying", "les_dissipates"):
        if key in (out or {}):
            assert out[key], (name, out)
    if name == "taylor_green_vortex_2d":
        assert all(r > 1.5 for r in out["rates"]), out
