"""Package hygiene (the reference runs Aqua.jl quality checks,
test/aqua.jl): all modules import, exports resolve, warmup runs."""

import importlib
import pkgutil

import ins_tpu


def test_all_modules_import():
    failed = []
    for mod in pkgutil.walk_packages(ins_tpu.__path__, "ins_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failed.append((mod.name, repr(e)))
    assert not failed, failed


def test_exports_resolve():
    for mod_name in (
        "ins_tpu",
        "ins_tpu.ops.operators",
        "ins_tpu.ops.pressure",
        "ins_tpu.ops.initializers",
        "ins_tpu.ops.matrices",
        "ins_tpu.ops.eddyviscosity",
        "ins_tpu.models",
        "ins_tpu.processors",
    ):
        mod = importlib.import_module(mod_name)
        for name in getattr(mod, "__all__", []):
            assert hasattr(mod, name), (mod_name, name)


def test_warmup_smoke():
    from ins_tpu.warmup import warmup

    results = warmup(verbose=False)
    assert all(results.values())
