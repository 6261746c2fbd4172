"""apvast_tpu — a TPU-native (JAX/XLA/Pallas) sound-zone framework.

Re-implements the full capability surface of the AP-VAST reference
(T. Lee et al., "Signal-Adaptive and Perceptually Optimized Sound Zones
with Variable Span Trade-Off Filters", IEEE/ACM TASLP 28 (2020)):

* streaming, signal-adaptive, perceptually weighted variable-span
  trade-off filter design for two-zone sound field control
  (reference: Python/apvast.py, Matlab/ControlMethods/apVast.m),
* the offline non-adaptive VAST baseline family — BACC (rank 1),
  pressure matching (full rank) and everything in between
  (reference: Matlab/ControlMethods/vast.m),
* the van de Par (2005) perceptual detectability model
  (reference: Matlab/ControlMethods/perceptualModel.m),
* evaluation: pressure prediction, acoustic contrast, NMSE,
  detectability (reference: Matlab/ControlMethods/predictPressure.m,
  Matlab/main.m:120-130).

The design is TPU-first rather than a port: a frozen static `ApVastConfig`,
a precomputed constant `ApVastPlan`, an immutable `ApVastState` pytree and a
pure `process_hop` compiled once with `jax.jit` and driven by `lax.scan`.
Every per-mic / per-src loop of the reference is a batch axis; the per-hop
lfilter bank is one batched overlap-save FFT convolution; the Toeplitz-GEMM
statistics are strided frames contracted on the MXU; the joint
diagonalization is a Cholesky-whitened symmetric eigendecomposition.
"""

from apvast_tpu.config import (
    ApVastConfig,
    PerceptualFrontend,
    RegularizationVariant,
    TargetFilterVariant,
    ToeplitzVariant,
    WeightingNorm,
)
from apvast_tpu.engine import (
    ApVastPlan,
    ApVastState,
    HopOutputs,
    build_plan,
    init_state,
    process_hop,
    run_stream,
)
from apvast_tpu.models.apvast import ApVast
from apvast_tpu.models.apvast_fd import ApVastFD
from apvast_tpu.models.vast_offline import vast_offline

__version__ = "0.1.0"

__all__ = [
    "ApVast",
    "ApVastFD",
    "ApVastConfig",
    "ApVastPlan",
    "ApVastState",
    "HopOutputs",
    "PerceptualFrontend",
    "RegularizationVariant",
    "TargetFilterVariant",
    "ToeplitzVariant",
    "WeightingNorm",
    "build_plan",
    "init_state",
    "process_hop",
    "run_stream",
    "vast_offline",
]
