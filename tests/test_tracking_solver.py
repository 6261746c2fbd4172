"""Tracking GEVD solver (ops/jdiag.jdiag_topk_tracked): invariants on
synthetic pencils and end-to-end engine equivalence with the exact EIGH
path. The solver's purpose is the TPU-scale hop (no per-hop (JL, JL)
factorization — see PERF.md round-4); these tests pin its CONTRACT:
exact-pencil Rayleigh-Ritz extraction with U^T B U = I, tracking under a
stale preconditioner, and engine-level contrast parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import GevdSolver
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
from apvast_tpu.ops.jdiag import jdiag, jdiag_topk_tracked


def _pencil(rng, n, extra=8):
    xa = rng.standard_normal((n, n + extra))
    xb = rng.standard_normal((n, n + extra))
    return xa @ xa.T, xb @ xb.T


def test_tracked_converges_to_dense(rng):
    """Repeated tracked calls on one fixed pencil (fresh preconditioner)
    converge to the dense solver's top eigenpairs, and the extraction
    satisfies U^T (B + reg I) U = I."""
    n, k, top, reg = 60, 24, 12, 1e-7
    a_np, b_np = _pencil(rng, n)
    a = jnp.asarray(np.stack([a_np, a_np]))
    b = jnp.asarray(np.stack([b_np, b_np]))
    q = jnp.asarray(rng.standard_normal((2, n, k)))
    lam = jnp.zeros((2, k))
    li = jnp.broadcast_to(jnp.eye(n), (2, n, n))
    rebuild = jnp.asarray(True)
    for _ in range(8):
        u, d, q, lam, li, sil, _ = jdiag_topk_tracked(
            a, b, reg, top, q, lam, li, rebuild, outer_steps=1
        )
    assert int(sil) == 0
    u_ref, d_ref = jdiag(jnp.asarray(a_np), jnp.asarray(b_np), reg)
    # The tracker is an INEXACT iterative solver (one expansion step per
    # call); 8 calls on a fixed pencil land well below engine tolerances.
    np.testing.assert_allclose(
        np.asarray(d[0]), np.asarray(d_ref)[:top], rtol=1e-5
    )
    # Extraction contract (jdiag.m:33-35): U^T B_loaded U = I.
    bl = b_np + reg * np.eye(n)
    g = np.asarray(u[0]).T @ bl @ np.asarray(u[0])
    # The inner small-pencil jitter perturbs the B-normalization by
    # O(jitter * kappa(bbar)); 1e-5 is far below engine tolerances.
    np.testing.assert_allclose(g, np.eye(top), atol=1e-5)


def test_tracked_stale_preconditioner_tracks(rng):
    """A sequence of rotating pencils with the preconditioner frozen
    after hop 0: the exact-pencil Rayleigh-Ritz keeps the Ritz values
    converging to each hop's TRUE eigenvalues (the property the
    rejected stale-operator power iteration lacks — config.py's
    subspace_whiten='newton' note)."""
    n, k, top = 48, 20, 8
    a_np, b_np = _pencil(rng, n)
    q = jnp.asarray(rng.standard_normal((2, n, k)))
    lam = jnp.zeros((2, k))
    li = jnp.broadcast_to(jnp.eye(n), (2, n, n))
    for t in range(8):
        # Slowly rotating bright matrix, drifting dark matrix.
        da, db = _pencil(rng, n)
        a_np = 0.9 * a_np + 0.1 * da
        b_np = 0.9 * b_np + 0.1 * db
        a = jnp.asarray(np.stack([a_np, a_np]))
        b = jnp.asarray(np.stack([b_np, b_np]))
        u, d, q, lam, li, sil, _ = jdiag_topk_tracked(
            a, b, 1e-7, top, q, lam, li,
            jnp.asarray(t == 0), outer_steps=2,
        )
    assert int(sil) == 0
    _, d_ref = jdiag(jnp.asarray(a_np), jnp.asarray(b_np), 1e-7)
    # Tracking accuracy bound, not exactness: the preconditioner is 8
    # hops stale and the pencil rotates 10% per hop.
    np.testing.assert_allclose(
        np.asarray(d[0]), np.asarray(d_ref)[:top], rtol=1e-3
    )


def _contrast_after(cfg, rir_a, rir_b, hops=10):
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(4)
    outs = []
    silenced = 0
    for _ in range(hops):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop)),
            jnp.asarray(rng.standard_normal(cfg.hop)),
        )
        silenced += int(out.silenced)
        outs.append(np.asarray(out.out_a))
    feeds = np.concatenate([o[0] for o in outs[5:]], axis=0)  # rank-1
    return float(
        acoustic_contrast_db(
            predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
            predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
        )
    ), silenced


def test_engine_tracking_matches_eigh(small_scene):
    cfg, rir_a, rir_b = small_scene
    exact, _ = _contrast_after(cfg, rir_a, rir_b)
    trk_cfg = dataclasses.replace(
        cfg,
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking",
        tracking_warmup_hops=4,
    )
    approx, silenced = _contrast_after(trk_cfg, rir_a, rir_b)
    assert silenced == 0
    assert abs(exact - approx) < 0.3, f"contrast {exact:.2f} vs {approx:.2f} dB"


def test_tracking_state_roundtrip(small_scene):
    """Tracking state fields (q, lam, li, hop counter) live in the state
    pytree — checkpoint/resume must preserve the carry bit-exactly."""
    cfg, rir_a, rir_b = small_scene
    cfg = dataclasses.replace(
        cfg, gevd_solver=GevdSolver.SUBSPACE, subspace_whiten="tracking"
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(0)
    for _ in range(3):
        state, _ = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop)),
            jnp.asarray(rng.standard_normal(cfg.hop)),
        )
    assert int(state.gevd_hop) == 3
    leaves = jax.tree.leaves(state)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)


def test_tracking_li_bf16_quality_and_validation():
    """config.tracking_li_bf16: the carried preconditioner in bfloat16
    must (a) keep the engine finite, (b) match the f32 carry's acoustic
    contrast (Li is a preconditioner, never a correctness input — the
    Rayleigh-Ritz solve is on the exact pencil), and (c) be rejected on
    float64 parity configs."""
    import dataclasses

    import numpy as np
    import pytest

    from apvast_tpu.config import ApVastConfig, GevdSolver
    from apvast_tpu.engine import build_plan, init_state, run_stream
    from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
    from apvast_tpu.utils.rir import synthetic_rirs

    base = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000, perceptual=False,
        dtype="float32", gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking", tracking_warmup_hops=2,
        tracking_rebuild_period=3,
    )
    ra = synthetic_rirs(64, 4, 8, seed=1)
    rb = synthetic_rirs(64, 4, 8, seed=2)
    rng = np.random.default_rng(5)
    nh = 16
    sa = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    sb = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    contrasts = {}
    for bf in (False, True):
        cfg = dataclasses.replace(base, tracking_li_bf16=bf)
        plan = build_plan(cfg, ra, rb)
        st = init_state(cfg, key=jax.random.key(0))
        if bf:
            assert st.gevd_minv.dtype == jnp.bfloat16
        st2, o = run_stream(cfg, plan, st, sa, sb)
        assert np.isfinite(np.asarray(o.out_a)).all()
        f = np.asarray(o.out_a)[nh // 2 :, 0].reshape(-1, 4)
        contrasts[bf] = float(
            acoustic_contrast_db(
                predict_pressure(f, ra), predict_pressure(f, rb)
            )
        )
    assert abs(contrasts[True] - contrasts[False]) < 0.05, contrasts

    with pytest.raises(ValueError, match="float32-production"):
        dataclasses.replace(base, dtype="float64", tracking_li_bf16=True)


def test_tracked_half_form_matches_full(rng):
    """half_form=True with M = tril(A,-1) + diag(A)/2 must reproduce the
    full-matrix call: same math, different summation order."""
    n, k, top, reg = 60, 24, 12, 1e-7
    a_np, b_np = _pencil(rng, n)

    def half(x):
        return np.tril(x, -1) + 0.5 * np.diag(np.diag(x))

    a = jnp.asarray(np.stack([a_np, a_np]))
    b = jnp.asarray(np.stack([b_np, b_np]))
    ah = jnp.asarray(np.stack([half(a_np), half(a_np)]))
    bh = jnp.asarray(np.stack([half(b_np), half(b_np)]))
    q0 = jnp.asarray(rng.standard_normal((2, n, k)))
    lam0 = jnp.zeros((2, k))
    li0 = jnp.broadcast_to(jnp.eye(n), (2, n, n))
    q, lam, li = q0, lam0, li0
    qh, lamh, lih = q0, lam0, li0
    for t in range(6):
        rebuild = jnp.asarray(t % 3 == 0)
        u, d, q, lam, li, sil, _ = jdiag_topk_tracked(
            a, b, reg, top, q, lam, li, rebuild, outer_steps=1
        )
        uh, dh, qh, lamh, lih, silh, _ = jdiag_topk_tracked(
            ah, bh, reg, top, qh, lamh, lih, rebuild, outer_steps=1,
            half_form=True,
        )
        assert int(sil) == 0 and int(silh) == 0
    d, dh, u, uh = map(np.asarray, (d, dh, u, uh))
    np.testing.assert_allclose(dh, d, rtol=1e-9)
    # Eigenvectors are sign-ambiguous (the inner eigh may flip columns
    # on bit-different inputs): align signs before comparing.
    sgn = np.sign(np.sum(u * uh, axis=1, keepdims=True))
    np.testing.assert_allclose(
        uh * sgn, u, rtol=1e-6, atol=1e-8 * float(np.abs(u).max())
    )


def test_statistics_half_form_engine_quality_and_validation():
    """config.statistics_half_form: the half-form statistics -> tracking
    solver hand-off must match the full-form engine's acoustic contrast
    (same sums, no completion pass), and be rejected with incompatible
    solvers/regularization."""
    import pytest

    from apvast_tpu.config import ApVastConfig, RegularizationVariant
    from apvast_tpu.engine import run_stream
    from apvast_tpu.utils.rir import synthetic_rirs

    base = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000, perceptual=False,
        dtype="float32", gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking", tracking_warmup_hops=2,
        tracking_rebuild_period=3, use_lag_statistics=True,
        lag_assembly="skew",
    )
    ra = synthetic_rirs(64, 4, 8, seed=1)
    rb = synthetic_rirs(64, 4, 8, seed=2)
    rng = np.random.default_rng(5)
    nh = 16
    sa = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    sb = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    cons = {}
    for hf in (False, True):
        cfg = dataclasses.replace(base, statistics_half_form=hf)
        plan = build_plan(cfg, ra, rb)
        st = init_state(cfg, key=jax.random.key(0))
        _, o = run_stream(cfg, plan, st, sa, sb)
        assert np.isfinite(np.asarray(o.out_a)).all()
        assert int(jnp.sum(o.silenced)) == 0
        f = np.asarray(o.out_a)[nh // 2 :, 0].reshape(-1, 4)
        cons[hf] = float(
            acoustic_contrast_db(
                predict_pressure(f, ra), predict_pressure(f, rb)
            )
        )
    assert abs(cons[True] - cons[False]) < 0.05, cons

    # half_form composes as a best-effort toggle (round 5: it is part
    # of production_overrides, which must stay composable with solver
    # overrides like the exact-eigh quality oracle): with a pipeline
    # that can't consume the half form the engine silently falls back
    # to completed matrices and must produce the same contrast.
    for over in (
        dict(subspace_whiten="invert"),
        dict(lag_assembly="wide"),
    ):
        cfg = dataclasses.replace(base, statistics_half_form=True, **over)
        plan = build_plan(cfg, ra, rb)
        st = init_state(cfg, key=jax.random.key(0))
        _, o = run_stream(cfg, plan, st, sa, sb)
        f = np.asarray(o.out_a)[nh // 2 :, 0].reshape(-1, 4)
        con = float(
            acoustic_contrast_db(
                predict_pressure(f, ra), predict_pressure(f, rb)
            )
        )
        ref = dataclasses.replace(base, statistics_half_form=False, **over)
        plan_r = build_plan(ref, ra, rb)
        _, o_r = run_stream(ref, plan_r, init_state(ref, key=jax.random.key(0)), sa, sb)
        f_r = np.asarray(o_r.out_a)[nh // 2 :, 0].reshape(-1, 4)
        con_r = float(
            acoustic_contrast_db(
                predict_pressure(f_r, ra), predict_pressure(f_r, rb)
            )
        )
        assert abs(con - con_r) < 1e-5, (over, con, con_r)

    # The one hard error: non-PYTHON regularization with an ACTIVE
    # half form (norm-based loading needs the completed matrix) —
    # raised by the engine at trace time.
    cfg_bad = dataclasses.replace(
        base,
        statistics_half_form=True,
        regularization=RegularizationVariant.MATLAB,
    )
    plan_bad = build_plan(cfg_bad, ra, rb)
    with pytest.raises(ValueError, match="PYTHON regularization"):
        run_stream(
            cfg_bad, plan_bad, init_state(cfg_bad, key=jax.random.key(0)),
            sa, sb,
        )


def test_tracking_residual_rebuild_triggers_on_level_step():
    """config.tracking_residual_rebuild (VERDICT r4 #4): with the fixed
    cadence effectively disabled (huge period), a 26 dB level step in
    the program material must raise the carried Ritz residual past the
    threshold and force a preconditioner rebuild (gevd_minv changes);
    without the trigger the stale identity-era preconditioner is carried
    unchanged forever."""
    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.utils.rir import synthetic_rirs

    base = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000, perceptual=False,
        dtype="float32", gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking", tracking_warmup_hops=2,
        tracking_rebuild_period=10_000,
    )
    ra = synthetic_rirs(64, 4, 8, seed=1)
    rb = synthetic_rirs(64, 4, 8, seed=2)
    rng = np.random.default_rng(5)
    hop = 32
    quiet = 0.05 * rng.standard_normal((8, 2, hop)).astype(np.float32)
    loud = rng.standard_normal((8, 2, hop)).astype(np.float32)
    hops = np.concatenate([quiet, loud])

    for thresh in (0.0, 0.35):
        cfg = dataclasses.replace(base, tracking_residual_rebuild=thresh)
        plan = build_plan(cfg, ra, rb)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
        minv_changed_after_step = False
        for t in range(hops.shape[0]):
            prev_minv = state.gevd_minv
            state, out = fn(
                state, jnp.asarray(hops[t, 0]), jnp.asarray(hops[t, 1])
            )
            if t >= 8 and not np.array_equal(
                np.asarray(prev_minv), np.asarray(state.gevd_minv)
            ):
                minv_changed_after_step = True
        assert np.isfinite(float(state.gevd_resid))
        if thresh > 0:
            assert minv_changed_after_step, (
                "residual trigger never rebuilt after the level step"
            )
        else:
            assert not minv_changed_after_step, (
                "cadence-only config rebuilt unexpectedly"
            )


def test_tracking_residual_precision_validation():
    import dataclasses

    import pytest

    from apvast_tpu.config import ApVastConfig, GevdSolver

    base = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000,
        perceptual=False, dtype="float32",
        gevd_solver=GevdSolver.SUBSPACE, subspace_whiten="tracking",
    )
    dataclasses.replace(base, tracking_residual_precision="default")
    with pytest.raises(ValueError, match="residual_precision"):
        dataclasses.replace(base, tracking_residual_precision="fast")
    with pytest.raises(ValueError, match="float32"):
        dataclasses.replace(
            base, dtype="float64", tracking_residual_precision="default"
        )


def test_tracking_direct_rr_basis_quality():
    """tracking_rr_basis='direct' (Rayleigh-Ritz on the raw [q, p]
    basis, reusing aq/bq — no CholeskyQR2) must match the orthonormalized
    basis's engine contrast within 0.25 dB on the small scene."""
    import dataclasses

    import numpy as np

    from apvast_tpu.config import ApVastConfig, GevdSolver
    from apvast_tpu.engine import build_plan, init_state, run_stream
    from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
    from apvast_tpu.utils.rir import synthetic_rirs

    base = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000, perceptual=False,
        dtype="float32", gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking", tracking_warmup_hops=2,
        tracking_rebuild_period=3,
    )
    ra = synthetic_rirs(64, 4, 8, seed=1)
    rb = synthetic_rirs(64, 4, 8, seed=2)
    rng = np.random.default_rng(5)
    nh = 16
    sa = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    sb = jnp.asarray(rng.standard_normal(32 * nh), jnp.float32)
    cons = {}
    for basis in ("cholqr2", "direct"):
        cfg = dataclasses.replace(base, tracking_rr_basis=basis)
        plan = build_plan(cfg, ra, rb)
        st = init_state(cfg, key=jax.random.key(0))
        _, o = run_stream(cfg, plan, st, sa, sb)
        assert np.isfinite(np.asarray(o.out_a)).all()
        f = np.asarray(o.out_a)[nh // 2 :, 0].reshape(-1, 4)
        cons[basis] = float(
            acoustic_contrast_db(
                predict_pressure(f, ra), predict_pressure(f, rb)
            )
        )
    assert abs(cons["direct"] - cons["cholqr2"]) < 0.25, cons


def test_tracking_recovers_after_true_silence():
    """Round-5 horizon-gate regression: a sustained TRUE-silence gap
    collapses the pencil until the inner cholqr2 of a ~zero RR matrix
    underflows the carried basis to EXACTLY zero — finite, so it walks
    through every isfinite guard — and a zero basis is absorbing (its
    block residual reads 0, below every rebuild threshold). Measured at
    32 spk on TPU: silent output for the remaining 768 hops of a
    1024-hop program stream while exact eigh recovered immediately.
    The zone-wise basis-health guard must restart collapsed zones and
    the engine must recover full contrast after the gap."""
    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.utils.rir import synthetic_rirs

    cfg = ApVastConfig(
        rir_length=64, num_srcs=4, num_mics=8, block_size=64,
        filter_length=8, modeling_delay=3, reference_index_a=0,
        reference_index_b=1, num_eigenvectors=4, mu=1.0,
        statistics_buffer_length=96, sampling_rate=8000, perceptual=False,
        dtype="float32", gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking", tracking_warmup_hops=2,
        tracking_rebuild_period=32, tracking_rr_basis="direct",
        tracking_residual_rebuild=2.5,
        use_lag_statistics=True, lag_assembly="skew",
        statistics_half_form=True,
    )
    ra = synthetic_rirs(64, 4, 8, seed=1)
    rb = synthetic_rirs(64, 4, 8, seed=2)
    plan = build_plan(cfg, ra, rb)
    st = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(5)
    hop = cfg.hop
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    tail = []
    for h in range(60):
        if 16 <= h < 36:  # 20 hops of exact silence
            a = np.zeros(hop, np.float32)
            b = np.zeros(hop, np.float32)
        else:
            a = rng.standard_normal(hop).astype(np.float32)
            b = rng.standard_normal(hop).astype(np.float32)
        st, out = fn(st, jnp.asarray(a), jnp.asarray(b))
        # The carried basis must NEVER go degenerate (the absorbing
        # state): all-finite with no underflowed column.
        q = st.gevd_q
        assert bool(jnp.isfinite(q).all()), h
        cn = float(jnp.min(jnp.sum(q * q, axis=-2)))
        assert cn > 1e-20, (h, cn)
        if h >= 44:  # well after signal returns
            tail.append(np.asarray(out.out_a)[0].reshape(-1, 4))
    f = np.concatenate(tail, axis=0)
    assert np.isfinite(f).all()
    con = float(
        acoustic_contrast_db(predict_pressure(f, ra), predict_pressure(f, rb))
    )
    # The mini scene supports modest contrast; the point is non-zero,
    # recovered output (the broken solver reads -inf/0 here).
    assert con > 3.0, con
