"""Blocked triangular inversion — matmuls instead of substitution.

XLA's TPU ``triangular_solve`` is latency-bound (blocked forward
substitution, largely independent of the RHS width), which makes the
GEVD whitening solves the dominant solver cost. Classic fix: invert the
Cholesky factor once per hop with the recursive block identity

    [L11  0 ]^-1   [ X11          0  ]
    [L21 L22]    = [-X22 L21 X11  X22]

organized so every level's work is a pair of *batched* matmuls and the
only substitution is ONE batched solve of the small diagonal blocks.
Whitening then becomes pure MXU work: C = (Li A) Li^T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

_HI = jax.lax.Precision.HIGHEST


def neumann_tri_inverse(l: jax.Array, refine: int = 2) -> jax.Array:
    """Inverse of (batched) lower-triangular ``l`` by exact Neumann
    doubling — matmuls only, no triangular-solve custom calls.

    Write L = D (I - M) with D = diag(L) and M strictly lower. M is
    nilpotent (M^n = 0), so the Neumann series terminates and factors as
    (I - M)^-1 = prod_j (I + M^(2^j)): ceil(log2(n)) squarings instead of
    n substitution steps. The squaring products cancel catastrophically
    in float32 when L is ill-conditioned, so ``refine`` Newton steps
    X <- X + X (I - L X) square the residual back down to the
    substitution-path level (each step is two more batched matmuls).
    All matmuls run at HIGHEST precision.
    """
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    d = jnp.diagonal(l, axis1=-2, axis2=-1)  # (..., n)
    # Exact-zero diagonal (semi-definite input) would give inf*0 = NaN in
    # the M assembly below; guard like _tri_inverse_2d in
    # ops/pallas/subspace.py so the result stays bounded instead.
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    m = eye - dinv[..., :, None] * l  # strictly lower, exact zeros on diag
    x = eye + m
    p = m
    steps = max(0, (n - 1).bit_length() - 1)
    for _ in range(steps):
        p = jnp.matmul(p, p, precision=_HI)
        x = x + jnp.matmul(x, p, precision=_HI)
    x = x * dinv[..., None, :]  # right-multiply by D^-1
    for _ in range(refine):
        x = x + jnp.matmul(
            x, eye - jnp.matmul(l, x, precision=_HI), precision=_HI
        )
    return x


def triangular_inverse(chol: jax.Array, num_blocks: int = 16) -> jax.Array:
    """Inverse of a lower-triangular matrix by blocked recursion.

    Args:
        chol: (..., n, n) lower-triangular (batch axes allowed).
        num_blocks: power-of-two diagonal block count; n must be
            divisible by it (falls back to one dense solve otherwise).

    Returns:
        (..., n, n) lower-triangular inverse.
    """
    n = chol.shape[-1]
    while num_blocks > 1 and (n % num_blocks != 0 or n // num_blocks < 8):
        num_blocks //= 2
    if num_blocks <= 1:
        eye = jnp.eye(n, dtype=chol.dtype)
        return solve_triangular(chol, eye, lower=True)

    if chol.ndim != 2:
        # Batch axes are handled by vmap at the call sites.
        return jax.vmap(
            lambda c: triangular_inverse(c, num_blocks)
        )(chol.reshape(-1, n, n)).reshape(chol.shape)

    b = n // num_blocks
    # Diagonal blocks: (nb, b, b). Small blocks are inverted together
    # with matmul-only Neumann doubling (the substitution custom call is
    # latency-bound); blocks past 50 rows go through ONE batched
    # substitution instead — the scaled strictly-lower part M of an RIR
    # covariance Cholesky factor has entries up to ~(max diag / min
    # diag) ~ 7, and the doubling's intermediate powers M^(2^j) grow
    # like 7^b before the nilpotent cutoff: ~7^50 ~ 1e42 sits just under
    # the float32 ceiling (measured working at JL = 800, b = 50), while
    # b = 100 at JL = 1600 overflows to inf and silenced EVERY hop of
    # the 32-speaker scene. The batched solve amortizes its latency
    # across the nb blocks.
    blocks = chol.reshape(num_blocks, b, num_blocks, b)
    diag_ii = jnp.einsum("ixiy->ixy", blocks)  # (nb, b, b)
    if b <= 50:
        inv_diag = neumann_tri_inverse(diag_ii)
    elif b % 2 == 0 and b <= 100:
        # One batched split-merge keeps 50 < b <= 100 on the
        # matmul-only path: halve every diagonal block, Neumann-invert
        # the 2*nb halves in ONE batch, merge with one batched matmul
        # pair. Going to 2x num_blocks instead would add a whole merge
        # level of small strided big-matrix slices (measured: 32-spk
        # engine 3.6 -> 4.2 ms/hop); the substitution fallback's
        # broadcast-identity RHS streams ~260 us/hop of (b, b) copies
        # on the same trace. This branch avoids both.
        h = b // 2
        nb = diag_ii.shape[0]
        halves = jnp.concatenate(
            [diag_ii[:, :h, :h], diag_ii[:, h:, h:]], axis=0
        )
        inv_h = neumann_tri_inverse(halves)
        x11, x22 = inv_h[:nb], inv_h[nb:]
        l21 = diag_ii[:, h:, :h]
        x21 = -jnp.matmul(
            x22, jnp.matmul(l21, x11, precision=_HI), precision=_HI
        )
        top = jnp.concatenate(
            [x11, jnp.zeros((nb, h, h), chol.dtype)], axis=2
        )
        inv_diag = jnp.concatenate(
            [top, jnp.concatenate([x21, x22], axis=2)], axis=1
        )
    else:
        eye_b = jnp.eye(b, dtype=chol.dtype)
        inv_diag = solve_triangular(
            diag_ii, jnp.broadcast_to(eye_b, diag_ii.shape), lower=True
        )

    # Assemble block-diagonal inverse, then merge pairwise upward.
    x = jnp.zeros_like(chol)
    for i in range(num_blocks):
        sl = slice(i * b, (i + 1) * b)
        x = x.at[sl, sl].set(inv_diag[i])

    size = b
    while size < n:
        # Merge adjacent (size x size) inverses: for each pair p at rows
        # [2p*size : (2p+2)*size], X21 = -X22 L21 X11. All pairs of a
        # level are independent, so the level's matmuls run BATCHED over
        # a stack of static slices instead of a chain of per-pair
        # matmuls — on TPU the per-pair chain is pure dispatch latency
        # (each 2x(size,size) matmul is microseconds of MXU work).
        # Stacked static slices (concat) rather than a block-diagonal
        # advanced index: the paired-index gather form SIGABRTs XLA's
        # CPU compiler inside the 8-device sharded dryrun
        # (__graft_entry__.dryrun_multichip, reproduced 3x).
        num_pairs = n // (2 * size)
        spans = [
            (2 * p * size, (2 * p + 1) * size, (2 * p + 2) * size)
            for p in range(num_pairs)
        ]
        x11 = jnp.stack([x[r0:r1, r0:r1] for r0, r1, _ in spans])
        x22 = jnp.stack([x[r1:r2, r1:r2] for _, r1, r2 in spans])
        l21 = jnp.stack([chol[r1:r2, r0:r1] for r0, r1, r2 in spans])
        # HIGH precision: a bf16 single-pass product here would cap
        # the whole inverse (hence the whitened operator and the
        # back-transform) at ~1e-2 relative accuracy.
        x21 = -jnp.matmul(
            x22,
            jnp.matmul(l21, x11, precision=jax.lax.Precision.HIGH),
            precision=jax.lax.Precision.HIGH,
        )
        for p, (r0, r1, r2) in enumerate(spans):
            x = x.at[r1:r2, r0:r1].set(x21[p])
        size *= 2
    return x
