"""Checkpoint / resume for solver and training state.

The reference has no solver checkpointing (SURVEY.md §5.4); this is a new
first-class component: any pytree of arrays (velocity, temperature, time,
RNG keys, closure parameters, optimizer state) round-trips through a
single file via flax msgpack serialization.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "checkpointer"]


def save_checkpoint(path, tree):
    """Serialize a pytree of arrays to `path` (msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def load_checkpoint(path, like):
    """Load a pytree saved by `save_checkpoint`; `like` provides the
    structure (same pytree with arbitrary array values)."""
    with open(path, "rb") as f:
        data = f.read()
    tree = serialization.from_bytes(like, data)
    return jax.tree.map(jnp.asarray, tree)


def checkpointer(path, *, nupdate=1, keep_last=1):
    """Processor that checkpoints (u, temp, t, n) every `nupdate` steps.

    Resume manually: `ckpt = load_checkpoint(file, like)` then pass
    `ustart=ckpt["u"], tempstart=ckpt["temp"]` and shifted `tlims` to
    `solve_unsteady` (the reference's manual-resume pattern,
    lib/NeuralClosure/src/data_generation.jl:194-198, made durable).
    """
    from ..processors import Processor

    saved = []

    def initialize(state):
        return saved

    def update(saved, state):
        n = int(state["n"])
        file = os.path.join(path, f"state_{n:08d}.msgpack")
        save_checkpoint(
            file,
            dict(
                u=state["u"],
                temp=state["temp"],
                t=state["t"],
                n=state["n"],
            ),
        )
        saved.append(file)
        while len(saved) > keep_last:
            old = saved.pop(0)
            if os.path.exists(old):
                os.remove(old)
        return saved

    p = Processor(initialize, update, lambda s, _: s, nupdate)
    p.ckpt_path = path  # solver NaN guard writes its emergency file here
    return p
