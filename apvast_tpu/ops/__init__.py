"""Numerics and DSP kernels of the framework (layer L0/L1 of the survey).

Note: ``engine.hop`` inlines fused multi-path variants of some of these
(statistics over all four signal paths with the mic psum; the streaming
convolution over both programs) for XLA fusion; the single-path versions
here are the public building blocks and the oracle-tested definitions.
The engine's inlined forms are validated against the same oracles
end-to-end (tests/test_engine_parity.py, tests/test_true_reference_parity.py).
"""

from apvast_tpu.ops.jdiag import jdiag, jdiag_batched
from apvast_tpu.ops.fir import streaming_fir, fir_kernel_spectra
from apvast_tpu.ops.framing import frame_buffer, statistics_matrices
from apvast_tpu.ops.synthesis import variable_span_filters
from apvast_tpu.ops.wola import (
    wola_analyze,
    wola_overlap_add,
    wola_overlap_add_tail,
)

__all__ = [
    "fir_kernel_spectra",
    "frame_buffer",
    "jdiag",
    "jdiag_batched",
    "statistics_matrices",
    "streaming_fir",
    "variable_span_filters",
    "wola_analyze",
    "wola_overlap_add",
    "wola_overlap_add_tail",
]
