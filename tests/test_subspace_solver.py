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


def _random_psd_pair(rng, n):
    xa = rng.standard_normal((n, n + 8))
    xb = rng.standard_normal((n, n + 8))
    return xa @ xa.T, xb @ xb.T


def test_triangular_inverse(rng):
    from apvast_tpu.ops.trisolve import triangular_inverse

    for n, nb in [(64, 8), (800, 16), (48, 16), (50, 16)]:
        x = rng.standard_normal((n, n + 4))
        chol = np.linalg.cholesky(x @ x.T + n * np.eye(n))
        li = np.asarray(triangular_inverse(jnp.asarray(chol), num_blocks=nb))
        np.testing.assert_allclose(li @ chol, np.eye(n), atol=1e-8)
        # stays lower triangular
        assert np.allclose(np.triu(li, 1), 0.0)


def test_triangular_inverse_jl1600_float32(rng):
    """Regression: at n = 1600 the 16-way blocking gives 100-row diagonal
    blocks, whose Neumann-doubling intermediate powers overflow float32
    (measured inf on the 32-speaker scene's real Cholesky factors —
    every hop silenced). Large blocks must take the batched-substitution
    path and stay finite at float32 on an RIR-covariance-like factor."""
    from apvast_tpu.ops.trisolve import triangular_inverse

    n = 1600
    # Spatially-correlated-covariance-like spectrum: fast-decaying
    # eigenvalues with a small relative floor, scaled tiny like the
    # 94 dB SPL-calibrated scenes.
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = 1e-6 * (np.geomspace(1.0, 1e-6, n) + 1e-6)
    spd = (q * ev) @ q.T
    spd = 0.5 * (spd + spd.T) + 1e-9 * np.eye(n)
    chol = np.linalg.cholesky(spd).astype(np.float32)
    li = np.asarray(triangular_inverse(jnp.asarray(chol)))
    assert np.isfinite(li).all()
    resid = li.astype(np.float64) @ chol.astype(np.float64) - np.eye(n)
    assert np.abs(resid).max() < 1e-2, np.abs(resid).max()


def test_neumann_tri_inverse(rng):
    """Matmul-only triangular inversion: exact on well-conditioned
    factors AND on the Cholesky factor of an ill-conditioned covariance
    (the solver's real operating point)."""
    from apvast_tpu.ops.trisolve import neumann_tri_inverse

    for n in (7, 50, 56, 128):
        x = rng.standard_normal((3, n, n + 4))
        spd = x @ np.swapaxes(x, 1, 2) + n * np.eye(n)
        chol = np.linalg.cholesky(spd)
        li = np.asarray(neumann_tri_inverse(jnp.asarray(chol)))
        np.testing.assert_allclose(
            li @ chol, np.broadcast_to(np.eye(n), (3, n, n)), atol=1e-10
        )
    # Ill-conditioned: rank-deficient covariance + tiny loading
    # (cond ~ 1e9), float64 and float32.
    y = rng.standard_normal((20, 128))
    spd = y.T @ y + 1e-7 * np.trace(y.T @ y) / 128 * np.eye(128)
    chol = np.linalg.cholesky(spd)
    li = np.asarray(neumann_tri_inverse(jnp.asarray(chol)))
    np.testing.assert_allclose(li @ chol, np.eye(128), atol=1e-6)
    # Float32 accuracy must match the substitution path (the Newton
    # refinement inside neumann_tri_inverse squares away the squaring-
    # cancellation error).
    from jax.scipy.linalg import solve_triangular

    c32 = jnp.asarray(chol, jnp.float32)
    li32 = np.asarray(neumann_tri_inverse(c32)).astype(np.float64)
    li_sub = np.asarray(
        solve_triangular(c32, jnp.eye(128, dtype=jnp.float32), lower=True)
    ).astype(np.float64)
    r_neu = np.max(np.abs(li32 @ chol - np.eye(128)))
    r_sub = np.max(np.abs(li_sub @ chol - np.eye(128)))
    assert r_neu < 3 * r_sub + 1e-6, f"neumann {r_neu} vs substitution {r_sub}"


def test_invert_whitening_matches_solve(rng):
    """Same eigenvalues, and the synthesized variable-span filters (the
    engine's consumable) agree — raw eigenvectors may differ by roundoff
    rotations inside near-degenerate clusters."""
    a0, b0 = _random_psd_pair(rng, 96)
    r = rng.standard_normal(96)
    q0 = jnp.asarray(rng.standard_normal((96, 32)))
    u1, d1, _ = jdiag_topk(jnp.asarray(a0), jnp.asarray(b0), 1e-7, 10, 30, q0, "cholqr2", "solve")
    u2, d2, _ = jdiag_topk(jnp.asarray(a0), jnp.asarray(b0), 1e-7, 10, 30, q0, "cholqr2", "invert")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-8)
    breg = b0 + 1e-7 * np.eye(96)
    for u in (np.asarray(u1), np.asarray(u2)):
        # 1e-6-relative Gram jitter in CholeskyQR2 bounds orthonormality
        np.testing.assert_allclose(u.T @ breg @ u, np.eye(10), atol=1e-5)
    w1 = (np.asarray(u1) * ((np.asarray(u1).T @ r) / (np.asarray(d1) + 1.0))).sum(1)
    w2 = (np.asarray(u2) * ((np.asarray(u2).T @ r) / (np.asarray(d2) + 1.0))).sum(1)
    np.testing.assert_allclose(w1, w2, rtol=1e-5, atol=1e-8)


def test_spectral_norm_matches_exact():
    """The MATLAB-loading power-iteration norm (engine/hop._spectral_norm)
    vs numpy's exact 2-norm (apVast.m:552-569 uses norm(R)) — on real
    covariance matrices built from framed signals, including a clustered
    top spectrum (the power method's hard case). Local seeded rng: the
    1% clustered-case tolerance is sensitive to the drawn rotation, and
    the shared session fixture's state depends on test order."""
    from apvast_tpu.engine.hop import _spectral_norm

    rng = np.random.default_rng(77)

    # Real covariance: framed filtered-noise signal (decaying spectrum).
    sig = np.convolve(rng.standard_normal(4000), np.ones(8) / 8)[:4000]
    frames = np.lib.stride_tricks.sliding_window_view(sig, 80)[::3]
    r = frames.T @ frames
    got = float(_spectral_norm(jnp.asarray(r)))
    want = np.linalg.norm(r, 2)
    # Lowpass-noise covariances have a top-eigenvalue PLATEAU; the
    # Rayleigh quotient converges into the plateau, i.e. within its
    # width of the exact norm — more than enough for a loading constant
    # (it scales 5e-3 * ||R||, apVast.m:555).
    assert abs(got - want) / want < 0.05, (got, want)

    # Clustered top eigenvalues: lambda1/lambda2 = 1.001.
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    lam = np.concatenate([[1.001, 1.0], rng.uniform(0.01, 0.9, 62)])
    r = (q * lam) @ q.T
    got = float(_spectral_norm(jnp.asarray((r + r.T) / 2)))
    want = np.linalg.norm((r + r.T) / 2, 2)
    # Within the cluster is fine for a loading constant (1% accuracy).
    assert abs(got - want) / want < 1e-2, (got, want)

    # Large-scale float32: ||R|| ~ 5e10, so an unnormalized R(Rv) step
    # would overflow float32 in its norm-of-squares (~lambda^4 > 3e38)
    # and silently return 0.0 — the scenes the MATLAB loading exists to
    # stabilize (ADVICE r2 medium). The between-matvec normalization
    # must keep the estimate finite and accurate.
    big = (5e10 * (q * lam) @ q.T).astype(np.float32)
    big = (big + big.T) / 2
    got = float(_spectral_norm(jnp.asarray(big)))
    want = float(np.linalg.norm(big.astype(np.float64), 2))
    assert np.isfinite(got) and got > 0
    assert abs(got - want) / want < 1e-2, (got, want)


def test_pencil_newton_matches_dense(rng):
    """jdiag_topk_pencil_batched: cold start takes the rebuild branch,
    subsequent drifted hops take the Newton branch; eigenvalues and
    B-orthonormality match the dense solver throughout (float64)."""
    from apvast_tpu.ops.jdiag import jdiag_topk_pencil_batched

    n, k, top = 64, 24, 10
    a0, b0 = _random_psd_pair(rng, n)
    a1, b1 = _random_psd_pair(rng, n)
    a = jnp.asarray(np.stack([a0, a1]))
    b = jnp.asarray(np.stack([b0, b1]))
    q = jnp.asarray(rng.standard_normal((2, n, k)))
    m = jnp.broadcast_to(jnp.eye(n), (2, n, n))

    for hop in range(6):
        # Slow pencil drift, as across engine hops.
        a = a + 0.02 * jnp.eye(n) * jnp.trace(a[0]) / n
        u, d, q, m, silenced = jdiag_topk_pencil_batched(
            a, b, 1e-7, top, 20 if hop == 0 else 4, q, m
        )
        assert int(silenced) == 0
    for z in range(2):
        u_ref, d_ref = jdiag(a[z], b[z], 1e-7)
        np.testing.assert_allclose(
            np.asarray(d[z]), np.asarray(d_ref)[:top], rtol=1e-8
        )
        # Contract: U^T (B + reg I) U = I on the kept columns.
        bl = np.asarray(b[z]) + 1e-7 * np.eye(n)
        gram = np.asarray(u[z]).T @ bl @ np.asarray(u[z])
        np.testing.assert_allclose(gram, np.eye(top), atol=1e-8)
    # Steady state must be on the Newton branch: the carried M is a real
    # inverse now (residual far below the rebuild threshold).
    resid = np.eye(n) - np.asarray(b[0] + 1e-7 * jnp.eye(n)) @ np.asarray(m[0])
    assert np.linalg.norm(resid) < 1e-6


def test_engine_newton_whiten_matches_eigh(small_scene):
    """Engine-level: subspace_whiten='newton' reproduces the exact
    solver's rank-1 contrast like the 'invert' path does."""
    cfg, rir_a, rir_b = small_scene
    exact = _contrast_after(cfg, rir_a, rir_b)
    newton_cfg = dataclasses.replace(
        cfg,
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_iters=8,
        subspace_whiten="newton",
    )
    approx = _contrast_after(newton_cfg, rir_a, rir_b)
    assert abs(exact - approx) < 0.3, f"contrast {exact:.2f} vs {approx:.2f} dB"
