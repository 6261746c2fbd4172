"""Utilities: RIR generation/loading and checkpoint helpers."""

from apvast_tpu.utils.rir import load_reference_rirs, synthetic_rirs

__all__ = ["load_reference_rirs", "synthetic_rirs"]
