"""Pytree-dataclass helper.

The framework's `Setup`/`Grid` configuration objects are frozen dataclasses
registered as JAX pytrees: array-valued fields are children (traced under
`jit`), everything else (shapes, index boxes, boundary-condition objects,
callables) is static auxiliary data. This replaces the reference's NamedTuple
setup (IncompressibleNavierStokes.jl `src/setup.jl:2-46`) with a form that
composes with `jax.jit`/`jax.grad` without retracing per call.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs):
    """Dataclass field treated as static (pytree aux data)."""
    metadata = dict(kwargs.pop("metadata", ()) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Freeze `cls` as a dataclass and register it as a JAX pytree.

    Fields declared with `static_field()` become aux data; all other fields
    are pytree children (may hold arrays, nested pytrees, tuples, or None).
    """
    cls = dataclasses.dataclass(frozen=True, eq=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
