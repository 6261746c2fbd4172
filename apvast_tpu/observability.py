"""Observability: per-hop quality metrics, timing, tracing, NaN guards.

The reference's observability is ``tic``/``toc`` prints (Matlab/main.m:55-57,
vast.m:43,80,84,93), ad-hoc metric code (main.m:120-130) and inline
imaginary-residual asserts (Python/apvast.py:216 et al.). Here:

* :func:`hop_metrics` — structured per-hop quality metrics computed on
  device from the engine outputs (contrast, NMSE vs target, output RMS).
* :class:`HopTimer` — wall-clock timing with *forced* device sync (on the
  axon TPU runtime ``block_until_ready`` does not actually wait; a scalar
  fetch does).
* :func:`trace` — context manager around ``jax.profiler`` for Perfetto
  traces.
* :func:`checked_hop` — a debug-mode hop with ``checkify`` NaN/Inf guards
  (the jit-safe analog of the reference's runtime asserts).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp

from apvast_tpu.evaluation.metrics import (
    acoustic_contrast_db,
    normalized_mse,
    predict_pressure,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HopMetrics:
    """Per-(hop, span) quality numbers; all computed on device."""

    contrast_a_db: jax.Array  # (spans,)
    contrast_b_db: jax.Array  # (spans,)
    nmse_a: jax.Array  # (spans,)
    nmse_b: jax.Array  # (spans,)
    output_rms: jax.Array  # (2, spans)
    # Non-finite solver/filter values zeroed by the engine's NaN guards
    # this hop (int32; 0 = healthy). A persistent positive count means a
    # conditioning problem that the guards would otherwise hide.
    silenced: jax.Array  # ()


def hop_metrics(outputs, rir_a, rir_b) -> HopMetrics:
    """Quality metrics for one hop's outputs (HopOutputs).

    Uses the hop's own samples only — a cheap running indicator, not the
    full-signal evaluation (use ``evaluation`` on stitched outputs for
    that, as Matlab/main.m:64-130 does). A disabled zone (out_a/out_b is
    None, mirroring the reference's run flags) reports NaN metrics and
    zero RMS for that zone.
    """
    # Zero feeds for a disabled zone (shape borrowed from the always
    # present target outputs).
    def zeros_like_feeds(t, ref):
        if t is not None:
            return t
        spans = ref.shape[0] if ref is not None else 1
        return jnp.zeros((spans, *outputs.out_a_t.shape), outputs.out_a_t.dtype)

    out_a = zeros_like_feeds(outputs.out_a, outputs.out_b)
    out_b = zeros_like_feeds(outputs.out_b, outputs.out_a)
    p_aa = predict_pressure(out_a, rir_a)
    p_ab = predict_pressure(out_a, rir_b)
    p_bb = predict_pressure(out_b, rir_b)
    p_ba = predict_pressure(out_b, rir_a)
    t_a = predict_pressure(outputs.out_a_t[None], rir_a)  # (1, hop, mics)
    t_b = predict_pressure(outputs.out_b_t[None], rir_b)
    rms = lambda x: jnp.sqrt(jnp.mean(x**2, axis=(-2, -1)))
    return HopMetrics(
        contrast_a_db=acoustic_contrast_db(p_aa, p_ab),
        contrast_b_db=acoustic_contrast_db(p_bb, p_ba),
        nmse_a=normalized_mse(p_aa, t_a),
        nmse_b=normalized_mse(p_bb, t_b),
        output_rms=jnp.stack([rms(out_a), rms(out_b)]),
        silenced=outputs.silenced,
    )


class HopTimer:
    """Wall-clock timing with forced device synchronization."""

    def __init__(self):
        self.samples: list[float] = []

    @staticmethod
    def sync(tree) -> float:
        """Force completion by reducing the pytree to one host scalar."""
        total = jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x).astype(jnp.float32)),
            tree,
            jnp.float32(0),
        )
        return float(total)

    @contextlib.contextmanager
    def measure(self, result_ref: list):
        """``with timer.measure(out): out.append(fn(...))`` — times until
        the appended result is fully materialized."""
        t0 = time.time()
        yield
        if result_ref:
            self.sync(result_ref[-1])
        self.samples.append(time.time() - t0)

    @property
    def median_ms(self) -> float:
        s = sorted(self.samples)
        return 1000.0 * s[len(s) // 2] if s else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """Perfetto/XPlane trace of everything inside the block
    (view with ``xprof`` / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked_hop(config):
    """A checkify-wrapped hop transition for debug runs: returns
    ``(err, (state, outputs))`` with NaN/Inf and index checks enabled —
    the jit-compatible analog of the reference's inline asserts
    (Python/apvast.py:216,223,270,...)."""
    from jax.experimental import checkify

    from apvast_tpu.engine.hop import process_hop

    def hop(plan, state, hop_a, hop_b):
        return process_hop(config, plan, state, hop_a, hop_b)

    return checkify.checkify(
        hop, errors=checkify.float_checks | checkify.index_checks
    )
