"""Fused subspace iteration: whitened power steps + CholeskyQR2 in ONE
Pallas kernel.

The production GEVD solver's iteration (ops/jdiag._topk_project with
whiten='invert', orth='cholqr2') is a chain of ~12 dependent XLA ops per
hop — big matmuls interleaved with small Cholesky custom calls and
Neumann inversions — that costs ~190 us of almost pure dispatch latency
on the axon runtime. Both pencils' operators (A, L^-1) fit in VMEM
(4 x 2.56 MB at JL = 800), so the whole iteration runs as one Mosaic
program: big matmuls at the engine's default precision, and the
CholeskyQR2 orthonormalization fully in-kernel (masked rank-1 column
Cholesky + Neumann-doubling triangular inversion at HIGHEST precision —
the same math as ops/trisolve.neumann_tri_inverse).

Everything inside the kernel is 2D with the pencil batch unrolled in
Python: Mosaic's layout inference is brittle for skinny rank-3 shapes
(a batched first draft crashed the TPU compiler in layout.h).

Returns the orthonormal subspace AND the small Rayleigh-Ritz projection
q^T (Li A Li^T) q, ready for the Jacobi eigensolver
(ops/pallas/jacobi_eigh).

MEASURED (axon v5e, north-star scene): 223 us/hop vs ~210 us for the
XLA op chain it replaces — the runtime pipelines the dependent chain
well enough that fusing is neutral here, so production keeps
``use_pallas_subspace=False``; the kernel is retained (tested on CPU
interpret + TPU) for runtimes with higher per-dispatch overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(x, y, precision=None):
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dot_t(x, y, precision=None):
    """x^T y on 2D operands."""
    return jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _chol_2d(g, n):
    """In-kernel Cholesky of one (n, n) SPD tile — statically-unrolled
    masked rank-1 column steps (unblocked right-looking)."""
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l = jnp.zeros((n, n), jnp.float32)
    for c in range(n):
        isr = jax.lax.rsqrt(jnp.maximum(g[c, c], 1e-30))
        colmask = (cols_r == c).astype(jnp.float32)
        col2 = g * colmask * isr  # column c in place, rest zero
        col2 = jnp.where(rows_c >= c, col2, 0.0)
        l = l + col2
        colv = jnp.sum(col2, axis=1, keepdims=True)  # (n, 1)
        g = g - colv * jnp.swapaxes(colv, 0, 1)
    return l


def _tri_inverse_2d(l, n):
    """Lower-triangular inverse of one (n, n) tile: exact Neumann
    doubling + two Newton refinements (HIGHEST matmuls), mirroring
    ops/trisolve.neumann_tri_inverse."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rows == cols).astype(jnp.float32)
    dvec = jnp.sum(l * eye, axis=1, keepdims=True)  # (n, 1)
    dinv = 1.0 / jnp.where(dvec == 0, 1.0, dvec)
    m = eye - dinv * l
    x = eye + m
    p = m
    steps = max(0, (n - 1).bit_length() - 1)
    for _ in range(steps):
        p = _dot(p, p, _HI)
        x = x + _dot(x, p, _HI)
    x = x * jnp.swapaxes(dinv, 0, 1)
    for _ in range(2):
        x = x + _dot(x, eye - _dot(l, x, _HI), _HI)
    return x


def _kernel(a_ref, li_ref, q_ref, qout_ref, small_ref, *, bz, n, k, iters,
            jitter_rel):
    kr = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    keye = (kr == kc).astype(jnp.float32)

    for b in range(bz):
        a = a_ref[b]
        li = li_ref[b]
        q = q_ref[b]

        def apply_white(x):
            y = _dot_t(li, x)  # L^-T x
            y = _dot(a, y)
            return _dot(li, y)

        def cholqr2(x):
            for _ in range(2):
                gram = _dot_t(x, x, _HI)
                trace = jnp.sum(gram * keye)
                gram = gram + (jitter_rel * trace / k + 1e-30) * keye
                chol = _chol_2d(gram, k)
                linv = _tri_inverse_2d(chol, k)
                x = _dot(x, jnp.swapaxes(linv, 0, 1))
            return x

        for _ in range(iters):
            q = cholqr2(apply_white(q))
        cq = apply_white(q)
        small = _dot_t(q, cq, _HI)
        qout_ref[b] = q
        small_ref[b] = 0.5 * (small + jnp.swapaxes(small, 0, 1))


def subspace_iterate_pallas(
    a: jax.Array,
    li: jax.Array,
    q0: jax.Array,
    iters: int,
    jitter_rel: float = 1e-6,
    interpret: bool = False,
):
    """Iterated B-whitened subspace + small Rayleigh-Ritz matrix.

    Args:
        a: (bz, n, n) float32 bright-covariance stack.
        li: (bz, n, n) float32 inverse Cholesky factors of the loaded
            dark covariances (lower triangular).
        q0: (bz, n, k) float32 warm-start subspace (k a multiple of 8).
        iters: whitened power steps, each followed by CholeskyQR2.

    Returns:
        (q, small): orthonormal (bz, n, k) subspace and its (bz, k, k)
        symmetric Rayleigh-Ritz projection of Li A Li^T.
    """
    bz, n, k = q0.shape
    if k % 8:
        raise ValueError("subspace width must be a multiple of 8")
    kernel = functools.partial(
        _kernel, bz=bz, n=n, k=k, iters=iters, jitter_rel=jitter_rel
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bz, n, k), jnp.float32),
            jax.ShapeDtypeStruct((bz, k, k), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=bz * (iters + 1) * 3 * 2 * n * n * k,
            bytes_accessed=bz * (2 * n * n + 2 * n * k) * 4,
            transcendentals=bz * iters * 2 * k,
        ),
    )(a.astype(jnp.float32), li.astype(jnp.float32), q0.astype(jnp.float32))
