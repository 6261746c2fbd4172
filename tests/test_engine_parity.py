"""End-to-end parity: the jitted TPU engine vs the NumPy/SciPy oracle that
reproduces Python/apvast.py semantics primitive-for-primitive
(survey §7.4 — the 'minimum end-to-end slice' milestone, here both with
and without the perceptual model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan, init_state, process_hop, run_stream
from apvast_tpu.oracle.reference_np import ReferenceApVast
from apvast_tpu.utils.rir import synthetic_rirs


def _noise(cfg, rng):
    """Shared noise init in both layouts (engine: time-last; oracle:
    reference time-first)."""
    resp = cfg.noise_init_scale * rng.standard_normal(
        (4, cfg.num_mics, cfg.num_srcs, cfg.block_size)
    )
    tresp = cfg.noise_init_scale * rng.standard_normal(
        (2, cfg.num_mics, cfg.block_size)
    )
    oracle_resp = resp.transpose(0, 3, 2, 1)  # (4, block, srcs, mics)
    oracle_tresp = tresp.transpose(0, 2, 1)
    return (resp, tresp), (oracle_resp, oracle_tresp)


def _run_both(cfg, rir_a, rir_b, num_hops, seed=7):
    rng = np.random.default_rng(seed)
    engine_noise, oracle_noise = _noise(cfg, rng)
    hops_a = rng.standard_normal((num_hops, cfg.hop))
    hops_b = rng.standard_normal((num_hops, cfg.hop))

    oracle = ReferenceApVast(cfg, rir_a, rir_b, response_noise=oracle_noise)
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, response_noise=engine_noise)
    hop_fn = jax.jit(lambda st, a, b: process_hop(cfg, plan, st, a, b))

    results = []
    for h in range(num_hops):
        want = oracle.process(hops_a[h], hops_b[h])
        state, out = hop_fn(state, jnp.asarray(hops_a[h]), jnp.asarray(hops_b[h]))
        # Engine targets are single-copy (hop, s); the reference emits V
        # identical copies — broadcast for comparison.
        tile = lambda t: jnp.broadcast_to(t, (cfg.num_eigenvectors, *t.shape))
        got = (out.out_a, out.out_b, tile(out.out_a_t), tile(out.out_b_t))
        results.append((got, want))
    return results


def _assert_close(got, want, rtol, atol):
    for g, w in zip(got, want):
        if w is None:
            assert g is None
            continue
        np.testing.assert_allclose(np.asarray(g), w, rtol=rtol, atol=atol)


def test_parity_non_perceptual(small_scene):
    cfg, rir_a, rir_b = small_scene
    for got, want in _run_both(cfg, rir_a, rir_b, num_hops=6):
        _assert_close(got, want, rtol=1e-7, atol=1e-9)


def test_parity_perceptual(small_scene):
    cfg, rir_a, rir_b = small_scene
    cfg = ApVastConfig(**{**cfg.__dict__, "perceptual": True})
    for got, want in _run_both(cfg, rir_a, rir_b, num_hops=5):
        _assert_close(got, want, rtol=1e-7, atol=1e-9)


def test_parity_zone_b_disabled(small_scene):
    cfg, rir_a, rir_b = small_scene
    cfg = ApVastConfig(**{**cfg.__dict__, "run_b": False})
    for got, want in _run_both(cfg, rir_a, rir_b, num_hops=4):
        assert got[1] is None and want[1] is None
        _assert_close(got, want, rtol=1e-7, atol=1e-9)


def test_scan_equals_hop_loop(small_scene):
    """run_stream (lax.scan) produces exactly the per-hop loop outputs."""
    cfg, rir_a, rir_b = small_scene
    rng = np.random.default_rng(3)
    engine_noise, _ = _noise(cfg, rng)
    sig_a = rng.standard_normal(cfg.hop * 5)
    sig_b = rng.standard_normal(cfg.hop * 5)

    plan = build_plan(cfg, rir_a, rir_b)
    state0 = init_state(cfg, response_noise=engine_noise)

    # scan path
    _, outs = run_stream(cfg, plan, state0, jnp.asarray(sig_a), jnp.asarray(sig_b))
    # loop path
    hop_fn = jax.jit(lambda st, a, b: process_hop(cfg, plan, st, a, b))
    state = state0
    for h in range(5):
        a = jnp.asarray(sig_a[h * cfg.hop : (h + 1) * cfg.hop])
        b = jnp.asarray(sig_b[h * cfg.hop : (h + 1) * cfg.hop])
        state, out = hop_fn(state, a, b)
        np.testing.assert_allclose(
            np.asarray(outs.out_a[h]), np.asarray(out.out_a), rtol=1e-12, atol=1e-12
        )


@pytest.mark.slow
def test_parity_reference_scale():
    """The measured-baseline scene: rirs (800, 8, 9), block 1600, JL=800,
    V=50 (BASELINE.md hyperparameters), 3 hops."""
    rir_a = synthetic_rirs(800, 8, 9, seed=11)
    rir_b = synthetic_rirs(800, 8, 9, seed=13)
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=1600,
        filter_length=100,
        modeling_delay=20,
        reference_index_a=7,
        reference_index_b=7,
        num_eigenvectors=50,
        mu=1.0,
        statistics_buffer_length=1000,
        sampling_rate=48000,
        perceptual=False,
    )
    for got, want in _run_both(cfg, rir_a, rir_b, num_hops=3):
        _assert_close(got, want, rtol=5e-5, atol=1e-8)
