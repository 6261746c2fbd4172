"""Pinned contrast-vs-rank curve on the north-star scene (VERDICT r3 #7).

The variable-span trade-off is THE product knob (mu/V,
Matlab/ControlMethods/apVast.m:113-122, Python/apvast.py:406-414):
rank 1 maximizes acoustic contrast, growing the span trades contrast for
target fidelity. Perf rounds must not silently trade this curve away, so
it is pinned here at the BASELINE.json north-star geometry (16
loudspeakers, 17 mics, JL=800, 48 kHz, perceptual ON, float32) for BOTH
the exact eigendecomposition solver and the production subspace solver:

  - production tracks exact within the 0.25 dB gate at EVERY pinned rank
    (not just the rank-1/rank-V endpoints tools/quality_gate.py checks);
  - the absolute curve sits within +-0.75 dB of the values measured on
    2026-08-19 (fixed seeds make the run deterministic up to backend
    rounding; the margin covers accumulation-order drift, not quality
    regressions — a solver change that moves contrast 1 dB fails).

Measured (CPU float32, 12 hops, seed 4, warm half scored):
  exact      rank 1/5/13/25/38/50 = 15.04 / 10.92 / 10.39 / 8.77 / 8.14 / 8.12 dB
  production rank 1/5/13/25/38/50 = 15.04 / 10.92 / 10.40 / 8.76 / 8.14 / 8.06 dB
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
from apvast_tpu.utils.scenes import scale_scene

# rank (1-based) -> pinned contrast dB, measured 2026-08-19 (module doc).
PINNED_EXACT = {1: 15.04, 5: 10.92, 13: 10.39, 25: 8.77, 38: 8.14, 50: 8.12}
HOPS = 12
GATE_DB = 0.25  # production-vs-exact (tools/quality_gate.py gate)
ANCHOR_DB = 0.75  # absolute drift allowance around the pinned values


def _contrast_curve(cfg, plan, rir_a, rir_b, ranks):
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(4)
    outs, silenced = [], 0
    for _ in range(HOPS):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
        )
        outs.append(np.asarray(out.out_a))
        silenced += int(out.silenced)
    assert silenced == 0, f"{silenced} solver outputs silenced"
    curve = {}
    for r in ranks:
        feeds = np.concatenate([o[r - 1] for o in outs[HOPS // 2 :]], axis=0)
        curve[r] = float(
            acoustic_contrast_db(
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
            )
        )
    return curve


@pytest.mark.slow
def test_north_star_contrast_vs_rank_curve_pinned():
    scene = scale_scene(16, **production_overrides("cpu"))
    base = scene.config
    assert base.jl == 800 and base.num_eigenvectors == 50
    plan = build_plan(base, scene.rir_a, scene.rir_b)
    ranks = sorted(PINNED_EXACT)

    exact_cfg = dataclasses.replace(base, gevd_solver=GevdSolver.EIGH)
    exact = _contrast_curve(exact_cfg, plan, scene.rir_a, scene.rir_b, ranks)
    prod = _contrast_curve(base, plan, scene.rir_a, scene.rir_b, ranks)
    # The TPU production whitening (round 4): tracking with the same
    # cadence production_overrides("tpu") ships (small_eigh stays LAPACK
    # here — the Jacobi kernel is interpret-only off-TPU).
    trk_cfg = dataclasses.replace(
        base,
        subspace_whiten="tracking",
        tracking_outer_steps=1,
        tracking_rebuild_period=8,
        tracking_warmup_hops=6,
    )
    trk = _contrast_curve(trk_cfg, plan, scene.rir_a, scene.rir_b, ranks)

    for r in ranks:
        assert abs(prod[r] - exact[r]) < GATE_DB, (r, prod, exact)
        assert abs(trk[r] - exact[r]) < GATE_DB, (r, trk, exact)
        assert abs(exact[r] - PINNED_EXACT[r]) < ANCHOR_DB, (r, exact)
    # The trade-off shape itself: rank 1 is the contrast end and the
    # curve decreases toward the full span (monotone within tolerance).
    for lo, hi in zip(ranks, ranks[1:]):
        assert exact[hi] <= exact[lo] + GATE_DB, exact
