"""Batched tiny Cholesky for thousands-of-small-pencils workloads.

The FD engine's full-span solve factorizes (2*bins, S*B, S*B) Hermitian
PD matrices per hop (S*B = 8..16). XLA lowers ``jnp.linalg.cholesky`` to
a LAPACK-shaped custom call that serializes the tiny factorizations —
measured 1.39 ms/hop at (1602, 8, 8) on v5e, the single most expensive
op in the hop (PERF.md round-4 FD breakdown). A right-looking Cholesky
UNROLLED over the (small, static) matrix dimension is n rank-1 updates,
each a fully vectorized VPU op over the batch: total n^3 work with no
custom call and no serialization.

The triangular solves stay on XLA's custom call (measured 18 us at the
same batch shape — not worth replacing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this the unrolled program stops being obviously better than the
# blocked custom call (and the trace grows linearly); the engine's use
# is S*B <= 32.
_MAX_UNROLL = 32


def cholesky_small(h: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor of batched tiny Hermitian PD
    matrices.

    ``h``: (..., n, n) complex or real, n <= 32 (static). Matches
    ``jnp.linalg.cholesky`` on the lower triangle; entries above the
    diagonal are exactly zero.
    """
    n = h.shape[-1]
    if n > _MAX_UNROLL:
        raise ValueError(
            f"cholesky_small unrolls the matrix dimension: n={n} > "
            f"{_MAX_UNROLL} belongs on jnp.linalg.cholesky"
        )
    rows = jnp.arange(n)
    a = h
    cols = []
    # Pivot floor (ADVICE r4): a rounding-induced non-PD pivot would put
    # sqrt(negative)=NaN into a whole factor column and silently poison
    # every downstream rank of that batch element. Clamp each pivot to a
    # tiny trace-relative floor — inert for healthy PD inputs (the clamp
    # engages only when the Schur diagonal is below ~eps * mean diag,
    # i.e. the pencil is numerically singular anyway), and it turns NaN
    # poisoning into a benign large-but-finite column that the engines'
    # late non-finite guards or regularization absorb.
    tr = jnp.real(jnp.trace(h, axis1=-2, axis2=-1)) / n
    eps = jnp.finfo(tr.dtype).eps
    floor = jnp.maximum(tr, jnp.finfo(tr.dtype).tiny) * eps
    for k in range(n):
        pivot = jnp.sqrt(jnp.maximum(jnp.real(a[..., k, k]), floor))
        col = a[..., :, k] / pivot.astype(a.dtype)[..., None]
        # Zero the strictly-upper part of the column (rows < k): those
        # entries of the running Schur complement are stale.
        col = jnp.where(rows >= k, col, jnp.zeros_like(col))
        cols.append(col)
        if k + 1 < n:
            a = a - col[..., :, None] * jnp.conj(col[..., None, :])
    return jnp.stack(cols, axis=-1)


def posdef_solve_small(h: jax.Array, r: jax.Array) -> jax.Array:
    """Solve h x = r for batched tiny Hermitian PD ``h``.

    ``h``: (..., n, n); ``r``: (..., n, m). Unrolled Cholesky (above) +
    XLA triangular solves.
    """
    from jax.scipy.linalg import solve_triangular

    chol = cholesky_small(0.5 * (h + jnp.conj(h.swapaxes(-1, -2))))
    y = solve_triangular(chol, r, lower=True)
    return solve_triangular(jnp.conj(chol.swapaxes(-1, -2)), y, lower=False)
