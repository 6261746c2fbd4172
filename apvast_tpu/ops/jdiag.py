"""Joint diagonalization of a symmetric-PSD matrix pencil (A, B).

TPU-native replacement for the reference ``jdiag``
(Python/apvast.py:20-36, Matlab/ControlMethods/jdiag.m:90-125): the
reference whitens with a Cholesky factor of B and then runs a real Schur
decomposition. Because the whitened matrix is symmetric, its Schur form
*is* its eigendecomposition, so the TPU kernel uses
``jnp.linalg.eigh`` — batched, differentiable and XLA-compiled — instead
of the LAPACK Hessenberg/QR path which does not exist on TPU.

Contract (Matlab/ControlMethods/jdiag.m:33-39):
    U^T A U = diag(d)   with d sorted descending,
    U^T B U = I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def jdiag(A: jax.Array, B: jax.Array, reg: float | jax.Array = 1e-7):
    """Jointly diagonalize one symmetric-PSD pencil.

    ``reg`` is the diagonal loading applied to B before the Cholesky
    factorization (the reference's EXPERIMENTAL_REGULARIZATION path,
    Python/apvast.py:22-24). Pass ``reg=0`` if loading was already applied
    by the caller (the MATLAB convention, apVast.m:552-569).

    Returns ``(U, d)`` where ``U`` has generalized eigenvectors in its
    columns and ``d`` holds eigenvalues in descending order.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    chol = jnp.linalg.cholesky(B + reg * eye)
    # Whiten: C = L^{-1} A L^{-T} (two triangular solves, as in
    # Python/apvast.py:28-29).
    half = solve_triangular(chol, A, lower=True)
    white = solve_triangular(chol, half.T, lower=True).T
    # The whitened matrix is symmetric up to roundoff; symmetrize so eigh
    # sees an exactly-symmetric operand.
    white = 0.5 * (white + white.T)
    d, v = jnp.linalg.eigh(white)  # ascending
    u = solve_triangular(chol.T, v, lower=False)  # back-transform
    # Descending order (Python/apvast.py:32-35 flips an argsort).
    return u[:, ::-1], d[::-1]


# Batched over a leading pencil axis: used to solve both zones (and any
# number of frames / subbands / hyperparameter grid points) in one XLA call.
jdiag_batched = jax.vmap(jdiag, in_axes=(0, 0, None))


def jdiag_hermitian(A: jax.Array, B: jax.Array, reg: float | jax.Array = 1e-7):
    """Joint diagonalization of a complex Hermitian-PSD pencil.

    The frequency-domain engine's per-bin analog of :func:`jdiag`: the
    S x S spatial covariance pencils of each STFT bin are complex
    Hermitian, so whitening uses conjugate transposes. Contract:
    ``U^H A U = diag(d)`` (d real, descending), ``U^H B_reg U = I``.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    chol = jnp.linalg.cholesky(B + reg * eye)
    half = solve_triangular(chol, A, lower=True)
    white = solve_triangular(chol, half.conj().T, lower=True).conj().T
    white = 0.5 * (white + white.conj().T)
    d, v = jnp.linalg.eigh(white)  # ascending, d real
    u = solve_triangular(chol.conj().T, v, lower=False)
    return u[:, ::-1], d[::-1]


# Batched over (zones x bins) — the FD engine's workhorse.
jdiag_hermitian_batched = jax.vmap(jdiag_hermitian, in_axes=(0, 0, None))
