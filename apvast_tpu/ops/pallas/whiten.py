"""Fused whitening setup: Cholesky + triangular inverse in ONE kernel.

The production GEVD solver's 'invert' whitening
(ops/jdiag._topk_project) spends ~350 us/hop on the north-star trace in
XLA's blocked Cholesky custom-call chain — 6 panel factorizations plus
6 trailing updates, each a separate dispatch on the latency-heavy axon
runtime — followed by the blocked triangular inversion's scatter/copy
traffic (ops/trisolve.triangular_inverse). The matrix itself is tiny by
MXU standards (JL = 800, 2.56 MB in float32): the whole factorization
PLUS the inverse fit comfortably in VMEM, so this kernel runs both as
one Mosaic program per pencil and the dispatch chain disappears.

Algorithm (per batch element, all in VMEM):

1. Blocked right-looking Cholesky, 128-wide panels. Each panel's
   diagonal block is factorized by masked rank-1 column steps (a
   fori_loop — the same math as XLA's unblocked kernel, so the
   stability story matches the custom call, unlike the
   Neumann-panel-solve variant that round 2 measured NaN-ing marginal
   float32 scenes, see ops/jdiag._topk_project). The panel inverse is
   computed immediately (32-wide diagonal sub-blocks by exact Neumann
   doubling — nilpotent index 32 keeps the doubling powers far from the
   float32 ceiling, cf. the b<=50 bound in ops/trisolve — merged
   pairwise), and the panel solve L21 = A21 Lp^-T and the trailing
   update become MXU matmuls. The trailing update touches only the
   block-lower-triangle (the factorization never reads above the
   diagonal).
2. Block-row forward substitution for X = L^-1 IN PLACE over the L
   buffer: row-block i of X depends on L's row-block i (still intact)
   and X's rows < i (already overwritten), so one (npad, npad) buffer
   serves as both — it starts as L and ends as X.

Inputs are padded to a 128 multiple with an identity diagonal block
(chol/inverse of blkdiag(B, I) = blkdiag(chol(B), I)), so Mosaic only
ever sees 128-aligned tiles.

VMEM budget: input block + output block + one scratch, 3 x npad^2
floats — 9.6 MB at JL = 800. Scenes past npad = 1024 (e.g. the
32-speaker JL = 1600 statistics) exceed VMEM and fall back to the XLA
chain at the call site.

Reference anchor: this implements the B-loading factorization the
reference performs inside eig(A, B, 'chol') / scipy.linalg.eigh per
hop (Matlab/GeneralPurpose/jdiag.m:12-14, Python/apvast.py:380-382) —
reorganized as a persistent-VMEM kernel, which has no reference
counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

_PANEL = 128
_SUB = 32


def _dot(x, y, precision=_HI):
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_nt(x, y, precision=_HI):
    """x y^T on 2D operands."""
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _chol_tile(g):
    """Cholesky of one (PANEL, PANEL) SPD tile by masked rank-1 column
    steps under a fori_loop (dynamic column masks keep the Mosaic
    program small; the unrolled variant in ops/pallas/subspace._chol_2d
    is only practical at subspace width)."""
    n = _PANEL
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(c, carry):
        g, l = carry
        diag = jnp.sum(jnp.where((rows == c) & (cols == c), g, 0.0))
        isr = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        col = jnp.where((cols == c) & (rows >= c), g * isr, 0.0)
        l = l + col
        colv = jnp.sum(col, axis=1, keepdims=True)  # (n, 1)
        g = g - colv * jnp.swapaxes(colv, 0, 1)
        return g, l

    _, l = jax.lax.fori_loop(
        0, n, body, (g, jnp.zeros((n, n), jnp.float32))
    )
    return l


def _neumann_inv_sub(l):
    """Exact Neumann-doubling inverse of a batch-free (SUB, SUB) lower
    tile + one Newton refinement (ops/trisolve.neumann_tri_inverse with
    the same zero-diagonal guard)."""
    n = _SUB
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rows == cols).astype(jnp.float32)
    d = jnp.sum(l * eye, axis=1, keepdims=True)
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    m = eye - dinv * l
    x = eye + m
    p = m
    for _ in range((n - 1).bit_length() - 1):
        p = _dot(p, p)
        x = x + _dot(x, p)
    x = x * jnp.swapaxes(dinv, 0, 1)
    for _ in range(2):
        x = x + _dot(x, eye - _dot(l, x))
    return x


def _tri_inv_panel(lp):
    """(PANEL, PANEL) lower-triangular inverse: SUB-wide diagonal blocks
    by Neumann doubling, merged pairwise as a functional concat tree
    (ops/trisolve.triangular_inverse restated without update-slices,
    which Mosaic does not lower on values)."""

    def merge(x11, x22, l21):
        s = x11.shape[0]
        x21 = -_dot(x22, _dot(l21, x11))
        top = jnp.concatenate([x11, jnp.zeros((s, s), jnp.float32)], axis=1)
        bot = jnp.concatenate([x21, x22], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def inv(r0, size):
        if size == _SUB:
            return _neumann_inv_sub(lp[r0:r0 + _SUB, r0:r0 + _SUB])
        half = size // 2
        x11 = inv(r0, half)
        x22 = inv(r0 + half, half)
        l21 = lp[r0 + half:r0 + size, r0:r0 + half]
        return merge(x11, x22, l21)

    return inv(0, _PANEL)


def _kernel(b_ref, li_ref, a_scr, *, npad):
    np_ = npad // _PANEL
    a_scr[...] = b_ref[0]
    li_ref[0] = jnp.zeros((npad, npad), jnp.float32)

    # ---- blocked Cholesky: L lands in the OUTPUT block (li_ref) ----
    panel_inv = []
    for p in range(np_):
        lo, hi = p * _PANEL, (p + 1) * _PANEL
        lp = _chol_tile(a_scr[lo:hi, lo:hi])
        lpinv = _tri_inv_panel(lp)
        panel_inv.append(lpinv)
        li_ref[0, lo:hi, lo:hi] = lp
        if p + 1 < np_:
            a21 = a_scr[hi:npad, lo:hi]
            l21 = _dot_nt(a21, lpinv)  # (m, PANEL)
            # One iterative-refinement step of the panel solve
            # L21 Lp^T = A21: the explicit-inverse multiply alone loses
            # ~cond(Lp) * eps, which compounds through the trailing
            # updates (measured 2e0 vs 8e-4 whitening residual on a
            # cond ~1e7 scene without this step).
            l21 = l21 + _dot_nt(a21 - _dot_nt(l21, lp), lpinv)
            li_ref[0, hi:npad, lo:hi] = l21
            # Trailing update, block-lower-triangle only, in 128-row
            # strips (bounds every intermediate at (PANEL, m)).
            for q in range(p + 1, np_):
                qlo, qhi = q * _PANEL, (q + 1) * _PANEL
                strip = l21[qlo - hi:qhi - hi, :]
                a_scr[qlo:qhi, hi:qhi] = a_scr[qlo:qhi, hi:qhi] - _dot_nt(
                    strip, l21[: qhi - hi, :]
                )

    # ---- in-place block-row forward substitution: L -> X = L^-1 ----
    # Row-block i reads L[i, :lo] (not yet overwritten) and X[:lo, :lo]
    # (already overwritten), then overwrites row-block i.
    li_ref[0, 0:_PANEL, 0:_PANEL] = panel_inv[0]
    for i in range(1, np_):
        lo, hi = i * _PANEL, (i + 1) * _PANEL
        lrow = li_ref[0, lo:hi, 0:lo]  # L's row-block i, still intact
        lp = li_ref[0, lo:hi, lo:hi]
        s = _dot(lrow, li_ref[0, 0:lo, 0:lo])
        xi = -_dot(panel_inv[i], s)
        # Same refinement for the block-row solve Lp Xi = -S.
        xi = xi + _dot(panel_inv[i], -s - _dot(lp, xi))
        li_ref[0, lo:hi, 0:lo] = xi
        li_ref[0, lo:hi, lo:hi] = panel_inv[i]


def chol_tri_inverse_pallas(
    b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Lower-triangular inverse Cholesky factors of an SPD batch.

    Args:
        b: (bz, n, n) float32 SPD stack (loading already applied).
        interpret: run in Pallas interpret mode (CPU tests).

    Returns:
        (bz, n, n) float32 ``L^-1`` with ``L L^T = b``, lower triangular
        — the same contract as ``triangular_inverse(cholesky(b))``.
    """
    bz, n, _ = b.shape
    if b.dtype != jnp.float32:
        raise ValueError("chol_tri_inverse_pallas is a float32 kernel")
    npad = -(-n // _PANEL) * _PANEL
    if npad > 1024:
        raise ValueError(
            f"n={n} exceeds the VMEM-resident limit (npad<=1024); "
            "use the XLA cholesky+triangular_inverse path"
        )
    if npad != n:
        pad = npad - n
        eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=b.dtype), (bz, pad, pad))
        b = jnp.concatenate(
            [
                jnp.concatenate(
                    [b, jnp.zeros((bz, n, pad), b.dtype)], axis=2
                ),
                jnp.concatenate(
                    [jnp.zeros((bz, pad, n), b.dtype), eye_pad], axis=2
                ),
            ],
            axis=1,
        )
    kernel = functools.partial(_kernel, npad=npad)
    li = pl.pallas_call(
        kernel,
        grid=(bz,),
        in_specs=[
            pl.BlockSpec(
                (1, npad, npad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, npad, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bz, npad, npad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((npad, npad), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=bz * 2 * (npad ** 3) // 3 * 2,
            bytes_accessed=bz * 3 * npad * npad * 4,
            transcendentals=bz * npad,
        ),
    )(b)
    if npad != n:
        li = li[:, :n, :n]
    return li
