"""Streaming AP-VAST engine (layer L3): pure functions over pytrees.

The reference implements this layer as a mutable class with ~30 instance
arrays updated in place per hop (Python/apvast.py:39-506). Here the same
information is split into three immutable pieces:

* ``ApVastConfig`` — hashable hyperparameters, jit-static,
* ``ApVastPlan``   — precomputed constants (RIR spectra, window,
  perceptual tables, target filter spectra),
* ``ApVastState``  — the per-hop carry pytree,

and one pure transition ``process_hop(config, plan, state, hop_a, hop_b)``
that is compiled once and driven either hop-by-hop (online) or by
``lax.scan`` (offline, ``run_stream``).
"""

from apvast_tpu.engine.plan import ApVastPlan, build_plan
from apvast_tpu.engine.state import ApVastState, init_state
from apvast_tpu.engine.hop import HopOutputs, process_hop
from apvast_tpu.engine.stream import run_stream, stitch_outputs

__all__ = [
    "ApVastPlan",
    "ApVastState",
    "HopOutputs",
    "build_plan",
    "init_state",
    "process_hop",
    "run_stream",
    "stitch_outputs",
]
