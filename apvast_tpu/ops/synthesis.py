"""Variable-span trade-off filter synthesis.

The reference accumulates rank-incremental filters in a Python loop,
materializing one filter per eigenvector rank i = 1..V
(Python/apvast.py:406-414; MATLAB builds one filter per requested span,
apVast.m:527-549). On TPU the whole family comes out of a single fused
expression: scale the eigenvector matrix by the per-eigenpair coefficients
``(u_i . r) / (lambda_i + mu)`` and take a cumulative sum over the rank
axis — every intermediate span is produced at once with one GEMM worth of
work, which exactly matches the Python engine's all-ranks output contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def variable_span_filters(
    u: jax.Array,
    eigenvalues: jax.Array,
    r: jax.Array,
    mu: float | jax.Array,
    num_eigenvectors: int,
) -> jax.Array:
    """All rank-1..V variable-span filters of one zone.

    Args:
        u: (JL, JL) generalized eigenvectors (columns), descending order.
        eigenvalues: (JL,) matching eigenvalues.
        r: (JL,) cross-correlation vector.
        mu: distortion/contrast trade-off regularizer.
        num_eigenvectors: V, the maximum span.

    Returns:
        w: (V, JL) where ``w[v]`` is the rank-(v+1) filter
        ``sum_{i<=v} (u_i . r) / (lambda_i + mu) u_i``
        (Python/apvast.py:410, apVast.m:540-541).
    """
    v = num_eigenvectors
    coeffs = (u[:, :v].T @ r) / (eigenvalues[:v] + mu)  # (V,)
    return jnp.cumsum(coeffs[:, None] * u[:, :v].T, axis=0)


def variable_span_filters_mu_grid(
    u: jax.Array,
    eigenvalues: jax.Array,
    r: jax.Array,
    mu_grid: jax.Array,
    num_eigenvectors: int,
) -> jax.Array:
    """The whole (mu x rank) filter surface from ONE eigendecomposition.

    The trade-off parameter mu enters only the per-eigenpair scaling
    (Python/apvast.py:410), so a full hyperparameter sweep costs one
    broadcasted divide + cumsum on top of a single GEVD — the reference
    would re-run the engine per mu (BASELINE.json sweep config 5).

    Returns: (len(mu_grid), V, JL).
    """
    v = num_eigenvectors
    proj = u[:, :v].T @ r  # (V,)
    coeffs = proj[None, :] / (eigenvalues[None, :v] + mu_grid[:, None])
    return jnp.cumsum(coeffs[..., None] * u[:, :v].T[None], axis=1)


def spans_from_family(w_family: jax.Array, spans) -> jax.Array:
    """Select specific spans out of the rank family — the MATLAB
    multi-solution contract (apVast.m:113-120) where ``spans`` is a list of
    eigenvector counts. ``w_family`` is (V, JL); returns (len(spans), JL)."""
    idx = jnp.asarray([s - 1 for s in spans])
    return w_family[idx]
