"""Docs coverage: every public symbol exported by `ins_tpu` (and the
models subpackage) must be mentioned in docs/manual/."""

import glob
import os
import types

import ins_tpu
import ins_tpu.models

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs", "manual")


def _doc_text():
    text = ""
    for f in glob.glob(os.path.join(DOCS, "*.md")):
        with open(f) as fh:
            text += fh.read()
    return text


def _public(mod):
    for n in dir(mod):
        if n.startswith("_"):
            continue
        v = getattr(mod, n)
        if isinstance(v, types.ModuleType):
            continue  # submodules are namespaces, not API surface
        yield n


def test_manual_exists():
    pages = glob.glob(os.path.join(DOCS, "*.md"))
    assert len(pages) >= 8, "per-topic manual pages missing"


def test_all_top_level_symbols_documented():
    text = _doc_text()
    missing = [n for n in _public(ins_tpu) if n not in text]
    assert not missing, f"undocumented public symbols: {missing}"


def test_all_model_symbols_documented():
    text = _doc_text()
    missing = [n for n in _public(ins_tpu.models) if n not in text]
    assert not missing, f"undocumented models symbols: {missing}"
