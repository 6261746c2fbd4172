"""Auxiliary subsystems (survey §5): multi-span output mode,
checkpoint/resume, observability, detectability metric, checkify guards."""

import dataclasses
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.evaluation.metrics import detectability
from apvast_tpu.observability import HopTimer, checked_hop, hop_metrics
from apvast_tpu.perceptual import build_perceptual_tables
from apvast_tpu.utils.checkpoint import load_state, save_state
from apvast_tpu.utils.rir import synthetic_rirs


def _run(cfg, rir_a, rir_b, hops, key=0):
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(key))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(11)
    outs = []
    for _ in range(hops):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop)),
            jnp.asarray(rng.standard_normal(cfg.hop)),
        )
        outs.append(out)
    return state, outs


def test_output_spans_selects_from_rank_family(small_scene):
    """MATLAB multi-solution mode (apVast.m:113-120): outputs at spans
    (1, 3, 6) must equal ranks 0, 2, 5 of the all-ranks Python mode."""
    cfg, rir_a, rir_b = small_scene
    _, full = _run(cfg, rir_a, rir_b, hops=4)

    spans_cfg = dataclasses.replace(cfg, output_spans=(1, 3, 6))
    _, selected = _run(spans_cfg, rir_a, rir_b, hops=4)

    for f, s in zip(full, selected):
        np.testing.assert_allclose(
            np.asarray(s.out_a),
            np.asarray(f.out_a)[[0, 2, 5]],
            rtol=1e-12,
            atol=1e-14,
        )
        assert s.out_b.shape[0] == 3
        # Targets are single-copy in HopOutputs (wrappers broadcast).
        assert s.out_a_t.ndim == 2


def test_checkpoint_resume_exact(tmp_path, small_scene):
    """Save at hop 3, resume, and the continuation must be bit-exact vs
    an uninterrupted run (survey §5 checkpoint/resume)."""
    cfg, rir_a, rir_b = small_scene
    plan = build_plan(cfg, rir_a, rir_b)
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(3)
    hops = [
        (rng.standard_normal(cfg.hop), rng.standard_normal(cfg.hop))
        for _ in range(6)
    ]

    state = init_state(cfg, key=jax.random.key(1))
    for a, b in hops[:3]:
        state, _ = fn(state, jnp.asarray(a), jnp.asarray(b))
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, state)

    # Continue original.
    ref_state = state
    ref_outs = []
    for a, b in hops[3:]:
        ref_state, out = fn(ref_state, jnp.asarray(a), jnp.asarray(b))
        ref_outs.append(np.asarray(out.out_a))

    # Resume from disk.
    resumed = load_state(path, cfg)
    res_outs = []
    for a, b in hops[3:]:
        resumed, out = fn(resumed, jnp.asarray(a), jnp.asarray(b))
        res_outs.append(np.asarray(out.out_a))

    for r, w in zip(res_outs, ref_outs):
        np.testing.assert_array_equal(r, w)


def test_checkpoint_config_validation(tmp_path, small_scene):
    cfg, rir_a, rir_b = small_scene
    state = init_state(cfg, key=jax.random.key(0))
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, state)
    other = dataclasses.replace(
        cfg, statistics_buffer_length=cfg.statistics_buffer_length + 8
    )
    try:
        load_state(path, other)
        raise AssertionError("expected shape mismatch error")
    except ValueError as e:
        assert "shape" in str(e)


def test_hop_metrics(small_scene):
    cfg, rir_a, rir_b = small_scene
    _, outs = _run(cfg, rir_a, rir_b, hops=6)
    metrics = hop_metrics(outs[-1], jnp.asarray(rir_a), jnp.asarray(rir_b))
    v = cfg.num_eigenvectors
    assert metrics.contrast_a_db.shape == (v,)
    assert metrics.output_rms.shape == (2, v)
    assert np.all(np.isfinite(np.asarray(metrics.contrast_a_db)))
    # Post-warmup contrast should be positive at the BACC end.
    assert float(metrics.contrast_a_db[0]) > 0.0


def test_hop_timer_sync():
    t = HopTimer()
    x = jnp.ones((256, 256))
    out = []
    with t.measure(out):
        out.append(jnp.matmul(x, x))
    assert len(t.samples) == 1 and t.samples[0] >= 0.0
    assert np.isfinite(t.median_ms)


def test_checked_hop_clean(small_scene):
    """checkify guards pass on healthy inputs (the debug-mode analog of
    the reference's inline asserts)."""
    cfg, rir_a, rir_b = small_scene
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(checked_hop(cfg))
    rng = np.random.default_rng(0)
    err, (state, out) = fn(
        plan,
        state,
        jnp.asarray(rng.standard_normal(cfg.hop)),
        jnp.asarray(rng.standard_normal(cfg.hop)),
    )
    err.throw()  # no error


def test_detectability_metric_scaling():
    """Louder test signals are more detectable; the calibration-level
    probe sits near D = 1 (perceptualModel.m:192-221)."""
    tables = build_perceptual_tables(1024, 8000.0, 94.0)
    rng = np.random.default_rng(0)
    masker = rng.standard_normal((3, 1024)) * 0.1
    quiet = rng.standard_normal((3, 1024)) * 1e-6
    loud = quiet * 1e4
    d_quiet = np.asarray(detectability(jnp.asarray(quiet), jnp.asarray(masker), tables))
    d_loud = np.asarray(detectability(jnp.asarray(loud), jnp.asarray(masker), tables))
    assert np.all(d_loud > d_quiet)
    np.testing.assert_allclose(d_loud, d_quiet * 1e8, rtol=1e-6)


def test_run_stream_with_metrics(small_scene):
    from apvast_tpu.engine.stream import run_stream_with_metrics

    cfg, rir_a, rir_b = small_scene
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(6)
    sig_a = jnp.asarray(rng.standard_normal(cfg.hop * 8))
    sig_b = jnp.asarray(rng.standard_normal(cfg.hop * 8))
    _, outs, metrics = run_stream_with_metrics(
        cfg, plan, state, sig_a, sig_b, jnp.asarray(rir_a), jnp.asarray(rir_b)
    )
    v = cfg.num_eigenvectors
    assert metrics.contrast_a_db.shape == (8, v)
    assert metrics.nmse_b.shape == (8, v)
    tail = np.asarray(metrics.contrast_a_db)[4:]
    assert np.all(np.isfinite(tail))
    # Steady-state per-hop contrast should be positive at the BACC end.
    assert tail[:, 0].mean() > 0.0


def test_fd_state_checkpoint_roundtrip(tmp_path):
    """save_state/load_state also cover the FD engine's state family."""
    from apvast_tpu.engine.fd_hop import FdState, init_fd_state
    from apvast_tpu.utils.rir import synthetic_rirs

    rir_a = synthetic_rirs(60, 3, 2, seed=3)
    cfg = ApVastConfig.for_rirs(
        rir_a, rir_a, block_size=64, filter_length=8, modeling_delay=2,
        reference_index_a=0, reference_index_b=0, num_eigenvectors=3,
        mu=1.0, statistics_buffer_length=17, sampling_rate=8000,
        perceptual=False,
    )
    state = init_fd_state(cfg, key=jax.random.key(4))
    path = os.path.join(tmp_path, "fd.npz")
    # Complex leaves (cov/cross) are split into real pairs ON DEVICE
    # before host transfer (the axon runtime cannot transfer complex).
    save_state(path, state)
    back = load_state(path, config=cfg, state_cls=FdState)
    assert back.cov.dtype == state.cov.dtype
    np.testing.assert_array_equal(np.asarray(back.cov), np.asarray(state.cov))
    np.testing.assert_array_equal(np.asarray(back.resp), np.asarray(state.resp))
    # Config validation must cover the FD family too (code-review r3):
    # a checkpoint from a different geometry is rejected, not returned.
    other = ApVastConfig.for_rirs(
        rir_a, rir_a, block_size=128, filter_length=8, modeling_delay=2,
        reference_index_a=0, reference_index_b=0, num_eigenvectors=3,
        mu=1.0, statistics_buffer_length=17, sampling_rate=8000,
        perceptual=False,
    )
    with pytest.raises(ValueError, match="shape"):
        load_state(path, config=other, state_cls=FdState)


def test_hop_metrics_disabled_zone(small_scene):
    """hop_metrics must handle a disabled zone (out_b None)."""
    cfg, rir_a, rir_b = small_scene
    cfg = dataclasses.replace(cfg, run_b=False)
    _, outs = _run(cfg, rir_a, rir_b, hops=3)
    m = hop_metrics(outs[-1], jnp.asarray(rir_a), jnp.asarray(rir_b))
    assert np.isfinite(np.asarray(m.contrast_a_db)).all()
    # Disabled zone reports zero RMS.
    np.testing.assert_allclose(np.asarray(m.output_rms[1]), 0.0)


def test_nan_guard_counter(small_scene, rng):
    """The solver's NaN-silencing guards COUNT what they zero
    (VERDICT round-1 weak #4): a poisoned pencil reports silenced > 0
    and still yields finite outputs; a healthy hop reports 0."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from apvast_tpu.config import GevdSolver
    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.ops.jdiag import jdiag_topk_batched

    # Unit level: NaN in the pencil -> counted, outputs finite.
    n, k = 32, 8
    xa = rng.standard_normal((2, n, n + 4))
    a = jnp.asarray(xa @ xa.transpose(0, 2, 1), jnp.float32)
    a = a.at[0, 0, 0].set(jnp.nan)
    b = jnp.asarray(
        rng.standard_normal((2, n, n)) * 0 + jnp.eye(n), jnp.float32
    )
    q0 = jnp.asarray(rng.standard_normal((2, n, k)), jnp.float32)
    u, d, q, silenced = jdiag_topk_batched(
        a, b, 1e-7, 4, 4, q0, "cholqr2", "invert"
    )
    assert int(silenced) > 0
    assert bool(jnp.all(jnp.isfinite(u))) and bool(jnp.all(jnp.isfinite(d)))

    # Engine level: healthy scene reports silenced == 0 per hop.
    cfg, rir_a, rir_b = small_scene
    cfg = dataclasses.replace(
        cfg, dtype="float32", gevd_solver=GevdSolver.SUBSPACE
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    state, out = jax.jit(lambda s, x, y: process_hop(cfg, plan, s, x, y))(
        state,
        jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
        jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
    )
    assert int(out.silenced) == 0
