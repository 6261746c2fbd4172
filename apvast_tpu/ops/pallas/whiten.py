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


def _dot_t(x, y, precision=_HI):
    """x^T y on 2D operands."""
    return jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _chol_sub(g):
    """Cholesky of one (SUB, SUB) SPD tile by statically-UNROLLED masked
    rank-1 column steps (ops/pallas/subspace._chol_2d at SUB width).
    Unrolling matters: static column indices make the diagonal pivot a
    scalar extract instead of a masked full-tile reduction — the
    fori_loop variant of this kernel measured ~230 us/hop slower
    in-engine than the XLA chain it replaces, almost entirely these
    reductions."""
    n = _SUB
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l = jnp.zeros((n, n), jnp.float32)
    for c in range(n):
        isr = jax.lax.rsqrt(jnp.maximum(g[c, c], 1e-30))
        col = jnp.where((cols == c) & (rows >= c), g * isr, 0.0)
        l = l + col
        colv = jnp.sum(col, axis=1, keepdims=True)  # (n, 1)
        g = g - colv * jnp.swapaxes(colv, 0, 1)
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


def _merge_tri(x11, x22, l21):
    """Merge two adjacent triangular inverses: X21 = -X22 L21 X11
    (ops/trisolve.triangular_inverse's recursion as a functional concat
    tree — Mosaic does not lower update-slices on values)."""
    s = x11.shape[0]
    x21 = -_dot(x22, _dot(l21, x11))
    top = jnp.concatenate([x11, jnp.zeros((s, s), jnp.float32)], axis=1)
    bot = jnp.concatenate([x21, x22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _panel_kernel(d_ref, lp_ref, inv_ref, *, bz):
    """Factorize a batch of (PANEL, PANEL) SPD diagonal blocks and
    invert the factors, all in VMEM: SUB-blocked unrolled rank-1 steps +
    Neumann sub-inverses + concat merge trees.

    Sub-blocks are extracted and placed with constant one-hot selector
    matmuls instead of lane-offset slices: Mosaic refuses to concatenate
    vectors whose non-concat-dimension offsets differ ("result/input
    offset mismatch"), and offset-32/64/96 slices force relayouts even
    where they compile. A matmul against a one-hot block always produces
    an offset-0 value, and the extra MXU work is noise at these sizes.
    """
    ns_ = _PANEL // _SUB
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (_PANEL, 1), 0)
    rp = jax.lax.broadcasted_iota(jnp.int32, (_PANEL, _SUB), 0)
    cp = jax.lax.broadcasted_iota(jnp.int32, (_PANEL, _SUB), 1)
    # E[s]: (PANEL, SUB) one-hot placing/extracting sub-block s.
    sel = [
        (rp == cp + s * _SUB).astype(jnp.float32) for s in range(ns_)
    ]
    for b in range(bz):
        d = d_ref[b]
        sub_invs = []
        cols = []  # full-height (PANEL, SUB) L column blocks
        for s in range(ns_):
            g1 = (s + 1) * _SUB
            e = sel[s]
            dcol = _dot(d, e)  # (PANEL, SUB) columns g0:g1, offset-0
            dd = _dot_t(e, dcol)  # (SUB, SUB) diagonal block
            ls = _chol_sub(dd)
            inv_s = _neumann_inv_sub(ls)
            sub_invs.append(inv_s)
            below = jnp.where(rows1 >= g1, dcol, 0.0)  # rows past block
            l21 = _dot_nt(below, inv_s)
            l21 = l21 + _dot_nt(below - _dot_nt(l21, ls), inv_s)
            colblk = l21 + _dot(e, ls)  # ls placed at rows g0:g1
            cols.append(colblk)
            if g1 < _PANEL:
                # Trailing update. Using the full column block instead
                # of its below-diagonal part also touches the
                # already-factorized rows/columns < g1 — which are never
                # read again (each later sub-block reads only its own
                # columns), so the extra terms are harmless and the
                # update needs no slicing.
                d = d - _dot_nt(colblk, colblk)
        lp = sum(_dot_nt(c, e) for c, e in zip(cols, sel))
        lp_ref[b] = lp

        def sub(i, j):  # L sub-block (i, j) via selector extraction
            return _dot_t(sel[i], _dot(lp, sel[j]))

        x01 = _merge_tri(sub_invs[0], sub_invs[1], sub(1, 0))
        x23 = _merge_tri(sub_invs[2], sub_invs[3], sub(3, 2))
        l21_big = jnp.concatenate(
            [
                jnp.concatenate([sub(2, 0), sub(2, 1)], axis=1),
                jnp.concatenate([sub(3, 0), sub(3, 1)], axis=1),
            ],
            axis=0,
        )
        inv_ref[b] = _merge_tri(x01, x23, l21_big)


def chol_panel_pallas(
    d: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Cholesky factors AND their inverses for a (bz, PANEL, PANEL) SPD
    batch, one fused kernel (the panel step of blocked_cholesky)."""
    bz = d.shape[0]
    if d.shape[-2:] != (_PANEL, _PANEL):
        raise ValueError(f"panel kernel is fixed at {_PANEL}")
    kernel = functools.partial(_panel_kernel, bz=bz)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bz, _PANEL, _PANEL), jnp.float32),
            jax.ShapeDtypeStruct((bz, _PANEL, _PANEL), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=bz * 2 * _PANEL ** 3,
            bytes_accessed=bz * 3 * _PANEL * _PANEL * 4,
            transcendentals=bz * _PANEL,
        ),
    )(d.astype(jnp.float32))


def blocked_cholesky(
    b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Blocked Cholesky with Pallas panel factorization + XLA trailing
    updates.

    XLA's TPU cholesky custom call spends ~28 us of dispatch latency per
    128-wide panel factorization on the axon runtime (~170 us/hop at
    JL = 800) while the actual panel work is microseconds; the trailing
    updates are ordinary MXU matmuls that XLA already pipelines well.
    This splits the difference: ONE fused Pallas kernel per diagonal
    panel (factor + inverse), explicit-inverse panel solves with an
    iterative-refinement step (same math as the fused whiten kernel,
    residuals at or below the custom-call chain's level), and the
    FLOP-carrying trailing updates left to XLA.

    Args:
        b: (bz, n, n) float32 SPD batch (loading applied).

    Returns:
        (bz, n, n) lower-triangular Cholesky factors, same contract as
        ``jnp.linalg.cholesky``.
    """
    bz, n, _ = b.shape
    if b.dtype != jnp.float32:
        raise ValueError("blocked_cholesky is a float32 path")
    npad = -(-n // _PANEL) * _PANEL
    if npad != n:
        pad = npad - n
        eye_pad = jnp.broadcast_to(
            jnp.eye(pad, dtype=b.dtype), (bz, pad, pad)
        )
        b = jnp.concatenate(
            [
                jnp.concatenate([b, jnp.zeros((bz, n, pad), b.dtype)], 2),
                jnp.concatenate([jnp.zeros((bz, pad, n), b.dtype), eye_pad], 2),
            ],
            axis=1,
        )
    np_ = npad // _PANEL
    hi_p = jax.lax.Precision.HIGH
    col_blocks = []
    trail = b  # (bz, m, m) remaining trailing matrix, m = npad - p*PANEL
    for p in range(np_):
        m = npad - p * _PANEL
        d = trail[:, :_PANEL, :_PANEL]
        lp, lpinv = chol_panel_pallas(d, interpret=interpret)
        if m > _PANEL:
            a21 = trail[:, _PANEL:, :_PANEL]  # (bz, m-PANEL, PANEL)
            l21 = jnp.einsum(
                "bij,bkj->bik", a21, lpinv, precision=hi_p
            )
            l21 = l21 + jnp.einsum(
                "bij,bkj->bik",
                a21 - jnp.einsum("bij,bkj->bik", l21, lp, precision=hi_p),
                lpinv,
                precision=hi_p,
            )
            trail = trail[:, _PANEL:, _PANEL:] - jnp.einsum(
                "bij,bkj->bik", l21, l21, precision=hi_p
            )
            block = jnp.concatenate([lp, l21], axis=1)  # (bz, m, PANEL)
        else:
            block = lp
        col_blocks.append(
            jnp.concatenate(
                [jnp.zeros((bz, p * _PANEL, _PANEL), jnp.float32), block],
                axis=1,
            )
        )
    out = jnp.concatenate(col_blocks, axis=2)
    if npad != n:
        out = out[:, :n, :n]
    return out


def _kernel(b_ref, li_ref, a_scr, *, npad):
    np_ = npad // _PANEL
    ns_ = _PANEL // _SUB
    a_scr[...] = b_ref[0]
    li_ref[0] = jnp.zeros((npad, npad), jnp.float32)

    # ---- blocked Cholesky: L lands in the OUTPUT block (li_ref) ----
    # Two-level blocking: SUB-wide sub-panels carry the sequential
    # rank-1 steps (statically unrolled on (SUB, SUB) tiles), the
    # PANEL level carries the MXU-heavy trailing updates on
    # lane-aligned 128-wide strips.
    panel_inv = []
    for p in range(np_):
        lo, hi = p * _PANEL, (p + 1) * _PANEL
        sub_invs = []
        for s in range(ns_):
            g0, g1 = lo + s * _SUB, lo + (s + 1) * _SUB
            ls = _chol_sub(a_scr[g0:g1, g0:g1])
            inv_s = _neumann_inv_sub(ls)
            sub_invs.append(inv_s)
            li_ref[0, g0:g1, g0:g1] = ls
            if g1 < npad:
                a21 = a_scr[g1:npad, g0:g1]  # (m, SUB)
                l21 = _dot_nt(a21, inv_s)
                # One iterative-refinement step of the sub-panel solve
                # L21 Ls^T = A21: the explicit-inverse multiply alone
                # loses ~cond(Ls) * eps, which compounds through the
                # trailing updates (measured 2e0 vs 8e-4 whitening
                # residual on a cond ~1e7 scene without this step).
                l21 = l21 + _dot_nt(a21 - _dot_nt(l21, ls), inv_s)
                li_ref[0, g1:npad, g0:g1] = l21
                if g1 < hi:
                    # In-panel trailing update (columns g1..hi only;
                    # the PANEL-level strips below cover the rest).
                    a_scr[g1:npad, g1:hi] = a_scr[g1:npad, g1:hi] - _dot_nt(
                        l21, l21[: hi - g1, :]
                    )
        # PANEL-level inverse from the SUB inverses (concat merge tree).
        x01 = _merge_tri(
            sub_invs[0], sub_invs[1],
            li_ref[0, lo + _SUB:lo + 2 * _SUB, lo:lo + _SUB],
        )
        x23 = _merge_tri(
            sub_invs[2], sub_invs[3],
            li_ref[0, lo + 3 * _SUB:hi, lo + 2 * _SUB:lo + 3 * _SUB],
        )
        lpinv = _merge_tri(
            x01, x23, li_ref[0, lo + 2 * _SUB:hi, lo:lo + 2 * _SUB]
        )
        panel_inv.append(lpinv)
        if p + 1 < np_:
            # Trailing update for columns past this panel,
            # block-lower-triangle only, in 128-row strips (bounds every
            # intermediate at (PANEL, m) and keeps lanes 128-aligned).
            l21 = li_ref[0, hi:npad, lo:hi]  # (m, PANEL), just written
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
