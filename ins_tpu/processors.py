"""Processors: in-loop observability and I/O.

Re-design of IncompressibleNavierStokes.jl `src/processors.jl`. A processor
is `(initialize, update, finalize)` over host-side snapshots of the solver
state, pulled at chunk boundaries of the jitted scan (the reference updates
an `Observable` after every step; here `nupdate` decimation also sets the
scan chunk size, so no step-level host sync is ever forced).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Processor",
    "processor",
    "timelogger",
    "fieldsaver",
    "observefield",
]


@dataclasses.dataclass
class Processor:
    initialize: Callable[[dict], Any]
    update: Callable[[Any, dict], Any]
    finalize: Callable[[Any, dict], Any]
    nupdate: int = 1


def processor(update, *, initialize=None, finalize=None, nupdate=1):
    """Build a processor from an update function `pstate, state -> pstate`
    (reference `processor`, src/processors.jl:22-40)."""
    return Processor(
        initialize=initialize or (lambda state: None),
        update=update,
        finalize=finalize or (lambda pstate, state: pstate),
        nupdate=nupdate,
    )


def timelogger(nupdate=1):
    """Log step number, time, umax and wall time per iteration
    (reference src/processors.jl:45-72)."""

    def initialize(state):
        return {"wall": time.perf_counter(), "n": int(state["n"])}

    def update(pstate, state):
        now = time.perf_counter()
        n = int(state["n"])
        itertime = (now - pstate["wall"]) / max(1, n - pstate["n"])
        umax = float(jnp.max(jnp.abs(state["u"])))
        print(
            f"Iteration {n}\tt = {float(state['t']):.3g}"
            f"\tΔt_wall = {itertime * 1e3:.3g} ms/it\tumax = {umax:.3g}"
        )
        return {"wall": now, "n": n}

    return Processor(initialize, update, lambda p, s: None, nupdate)


def fieldsaver(nupdate=1):
    """Keep host copies of the full state every `nupdate` steps
    (reference src/processors.jl:290-300)."""

    def initialize(state):
        return []

    def update(fields, state):
        fields.append(
            dict(
                u=np.asarray(state["u"]),
                temp=None if state["temp"] is None else np.asarray(state["temp"]),
                t=float(state["t"]),
            )
        )
        return fields

    return Processor(initialize, update, lambda fields, s: fields, nupdate)


def observefield(func, *, nupdate=1):
    """Record a derived quantity `func(state) -> value` every `nupdate`
    steps (reference `observefield`, src/processors.jl:77-198)."""

    def initialize(state):
        return []

    def update(vals, state):
        vals.append(jax.device_get(func(state)))
        return vals

    return Processor(initialize, update, lambda vals, s: vals, nupdate)
