"""van de Par (2005) perceptual detectability model (layer L2).

Setup-time table construction lives in ``tables`` (NumPy, float64, runs
once per config); the per-frame gain evaluation lives in ``model`` (pure
JAX, jit/vmap-safe — no data-dependent control flow)."""

from apvast_tpu.perceptual.tables import (
    PerceptualTables,
    build_libdetectability_tables,
    build_perceptual_tables,
    fixed_taps_gammatone_bank,
)
from apvast_tpu.perceptual.model import (
    detectability,
    perceptual_gain,
    squared_weighting,
)

__all__ = [
    "PerceptualTables",
    "build_libdetectability_tables",
    "build_perceptual_tables",
    "fixed_taps_gammatone_bank",
    "detectability",
    "perceptual_gain",
    "squared_weighting",
]
