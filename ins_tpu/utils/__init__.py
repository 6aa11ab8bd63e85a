"""Utilities (spectrum binning, seeds, plot helpers).

Re-design of IncompressibleNavierStokes.jl `src/utils.jl`.
"""

from .spectrum import (  # noqa: F401
    get_lims,
    getoffset,
    spectral_stuff,
    splitseed,
)
