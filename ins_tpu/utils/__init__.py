"""Utilities (spectrum binning, seeds, plot helpers).

Re-design of IncompressibleNavierStokes.jl `src/utils.jl`.
"""

from .spectrum import spectral_stuff  # noqa: F401
