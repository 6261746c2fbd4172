"""SUBSPACE GEVD solver: top-k eigenpair accuracy and end-to-end
equivalence with the exact EIGH path (acoustic metrics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig, GevdSolver
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
from apvast_tpu.ops.jdiag import jdiag, jdiag_topk
from apvast_tpu.utils.rir import synthetic_rirs


def test_topk_matches_dense(rng):
    """Cold-start subspace iteration reproduces the dense solver's top
    eigenpairs (generous iterations, float64)."""
    n, k, top = 60, 24, 12
    xa = rng.standard_normal((n, n + 8))
    xb = rng.standard_normal((n, n + 8))
    a, b = jnp.asarray(xa @ xa.T), jnp.asarray(xb @ xb.T)
    q0 = jnp.asarray(rng.standard_normal((n, k)))
    u_ref, d_ref = jdiag(a, b, 1e-7)
    u, d, q = jdiag_topk(a, b, 1e-7, top, 60, q0)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref)[:top], rtol=1e-8)
    assert q.shape == (n, k)
    for i in range(top):
        ours, ref = np.asarray(u[:, i]), np.asarray(u_ref[:, i])
        sign = np.sign(ours @ ref)
        np.testing.assert_allclose(sign * ours, ref, rtol=1e-5, atol=1e-7)


def test_warm_start_converges_faster(rng):
    """Re-running with the returned subspace needs few iterations."""
    n, top = 80, 10
    xa = rng.standard_normal((n, n + 8))
    xb = rng.standard_normal((n, n + 8))
    a, b = jnp.asarray(xa @ xa.T), jnp.asarray(xb @ xb.T)
    q0 = jnp.asarray(rng.standard_normal((n, 32)))
    _, d_ref = jdiag(a, b, 1e-7)
    _, _, q1 = jdiag_topk(a, b, 1e-7, top, 40, q0)
    # Perturb the pencil slightly (a new hop) and warm-start with q1.
    a2 = a + 0.01 * a[0, 0] * jnp.eye(n)
    _, d2, _ = jdiag_topk(a2, b, 1e-7, top, 2, q1)
    u_ref2, d_ref2 = jdiag(a2, b, 1e-7)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref2)[:top], rtol=1e-6)


def _contrast_after(cfg, rir_a, rir_b, hops=10):
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(4)
    outs = []
    for _ in range(hops):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop)),
            jnp.asarray(rng.standard_normal(cfg.hop)),
        )
        outs.append(np.asarray(out.out_a))
    feeds = np.concatenate([o[0] for o in outs[5:]], axis=0)  # rank-1
    return float(
        acoustic_contrast_db(
            predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
            predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
        )
    )


def test_engine_subspace_matches_eigh(small_scene):
    cfg, rir_a, rir_b = small_scene
    exact = _contrast_after(cfg, rir_a, rir_b)
    sub_cfg = dataclasses.replace(
        cfg, gevd_solver=GevdSolver.SUBSPACE, subspace_iters=8
    )
    approx = _contrast_after(sub_cfg, rir_a, rir_b)
    assert abs(exact - approx) < 0.3, f"contrast {exact:.2f} vs {approx:.2f} dB"


@pytest.mark.slow
def test_engine_subspace_matches_eigh_reference_scale():
    """Reference-scale scene (JL=800, V=50): the subspace engine's rank-1
    and rank-50 contrast must match the exact solver's within 0.1 dB."""
    from apvast_tpu.utils.rir import load_reference_rirs

    rir_a, rir_b = load_reference_rirs()
    base = ApVastConfig.for_rirs(
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
        dtype="float64",
    )
    exact = _contrast_after(base, rir_a, rir_b, hops=8)
    sub = dataclasses.replace(base, gevd_solver=GevdSolver.SUBSPACE)
    approx = _contrast_after(sub, rir_a, rir_b, hops=8)
    assert abs(exact - approx) < 0.1, f"{exact:.2f} vs {approx:.2f} dB"
