"""Utilities: RIR generation/loading and checkpoint helpers."""

from apvast_tpu.utils.rir import (
    from_vast_layout,
    load_reference_rirs,
    synthetic_rirs,
)

__all__ = ["from_vast_layout", "load_reference_rirs", "synthetic_rirs"]
