"""N1: joint diagonalization — invariants and parity with the reference's
Cholesky + Schur path (survey §7.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.ops.jdiag import jdiag, jdiag_batched
from apvast_tpu.oracle.reference_np import reference_jdiag


def _random_psd_pair(rng, n, rank_deficit=0):
    """Symmetric PSD (A, B) like the engine's covariance pencils."""
    k = n + 8 - rank_deficit
    ya = rng.standard_normal((n, k))
    yb = rng.standard_normal((n, k))
    return ya @ ya.T, yb @ yb.T


def test_invariants(rng):
    """U^T A U = diag(d) descending, U^T B_reg U = I
    (Matlab/ControlMethods/jdiag.m:33-39)."""
    a, b = _random_psd_pair(rng, 24)
    reg = 1e-7
    u, d = jdiag(jnp.asarray(a), jnp.asarray(b), reg)
    u, d = np.asarray(u), np.asarray(d)
    b_reg = b + reg * np.eye(24)
    np.testing.assert_allclose(u.T @ b_reg @ u, np.eye(24), atol=1e-8)
    np.testing.assert_allclose(u.T @ a @ u, np.diag(d), atol=1e-7)
    assert np.all(np.diff(d) <= 1e-12)  # descending


def test_matches_reference_schur_path(rng):
    """eigh-based jdiag == Schur-based reference jdiag (same reg) up to
    eigenvector sign, at float64 precision."""
    a, b = _random_psd_pair(rng, 20)
    u, d = jdiag(jnp.asarray(a), jnp.asarray(b), 1e-7)
    u_ref, d_ref = reference_jdiag(a, b, 1e-7)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-9, atol=1e-12)
    # Columns agree up to sign when eigenvalues are distinct.
    for i in range(20):
        ours, ref = np.asarray(u[:, i]), u_ref[:, i]
        sign = np.sign(ours @ ref)
        np.testing.assert_allclose(sign * ours, ref, rtol=1e-6, atol=1e-8)


def test_filter_synthesis_invariant_to_decomposition(rng):
    """The quantity the engine consumes — sum_i (u_i.r)/(d_i+mu) u_i — is
    identical between the eigh and Schur paths even where eigenvectors
    could differ (survey §7 'hard parts': compare filters, not U)."""
    a, b = _random_psd_pair(rng, 16)
    r = rng.standard_normal(16)
    mu = 1.0
    u, d = jdiag(jnp.asarray(a), jnp.asarray(b), 1e-7)
    u_ref, d_ref = reference_jdiag(a, b, 1e-7)
    for v in (1, 5, 16):
        w = np.asarray(
            (np.asarray(u)[:, :v] * ((np.asarray(u)[:, :v].T @ r) / (np.asarray(d)[:v] + mu))).sum(1)
        )
        w_ref = (u_ref[:, :v] * ((u_ref[:, :v].T @ r) / (d_ref[:v] + mu))).sum(1)
        np.testing.assert_allclose(w, w_ref, rtol=1e-7, atol=1e-10)


def test_batched(rng):
    a0, b0 = _random_psd_pair(rng, 12)
    a1, b1 = _random_psd_pair(rng, 12)
    ub, db = jdiag_batched(
        jnp.stack([jnp.asarray(a0), jnp.asarray(a1)]),
        jnp.stack([jnp.asarray(b0), jnp.asarray(b1)]),
        1e-7,
    )
    u1, d1 = jdiag(jnp.asarray(a1), jnp.asarray(b1), 1e-7)
    np.testing.assert_allclose(np.asarray(db[1]), np.asarray(d1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ub[1]), np.asarray(u1), rtol=1e-8, atol=1e-10)


def test_near_singular_dark_matrix(rng):
    """Regularization keeps the pencil solvable for rank-deficient B — the
    reference's motivating case (Python/apvast.py:21-24)."""
    a, b = _random_psd_pair(rng, 16, rank_deficit=12)
    u, d = jdiag(jnp.asarray(a), jnp.asarray(b), 1e-7)
    assert np.all(np.isfinite(np.asarray(u)))
    assert np.all(np.isfinite(np.asarray(d)))


def test_cholesky_small_matches_lapack():
    """ops/small_chol: the unrolled tiny-batch Cholesky must match
    jnp.linalg.cholesky (lower triangle, zeros above) and solve PD
    systems — it replaces the LAPACK-shaped custom call that costs
    1.39 ms at (1602, 8, 8) in the FD hop on v5e."""
    import numpy as np

    from apvast_tpu.ops.small_chol import cholesky_small, posdef_solve_small

    rng = np.random.default_rng(11)
    for n, dt in ((8, np.complex64), (16, np.complex64), (5, np.float64)):
        x = rng.standard_normal((64, n, n + 3))
        if np.issubdtype(dt, np.complexfloating):
            x = x + 1j * rng.standard_normal((64, n, n + 3))
        h = (x @ np.conj(x.swapaxes(-1, -2))).astype(dt)
        ref = np.linalg.cholesky(h)
        got = np.asarray(cholesky_small(jnp.asarray(h)))
        tol = 1e-5 * np.max(np.abs(ref)) if dt == np.complex64 else 1e-11
        np.testing.assert_allclose(got, ref, atol=tol, rtol=0)
        r = rng.standard_normal((64, n, 2)).astype(dt)
        w = np.asarray(posdef_solve_small(jnp.asarray(h), jnp.asarray(r)))
        resid = np.max(np.abs(h @ w - r))
        assert resid < (1e-3 if dt == np.complex64 else 1e-9), resid

    import pytest

    with pytest.raises(ValueError, match="unrolls"):
        cholesky_small(jnp.eye(40))
