#!/usr/bin/env python
"""Per-stage device timing of the production GEVD solver at scale.

The 32-speaker (JL=1600) hop spends ~2.5 ms in the solver (VERDICT r3
weak #2) — this tool attributes that to stages so the attack is aimed:

  full    : jdiag_topk_batched, production arguments
  chol    : Cholesky of the loaded dark pencils alone
  cholinv : Cholesky + blocked triangular inversion (whitening setup)
  iter    : subspace iterations + Rayleigh-Ritz + extraction, with the
            whitening inverse precomputed OUTSIDE the loop
  inv8/32 : triangular_inverse block-count variants

Timings are chained fori_loop differences (tools/lag_lab.py method):
N dependent calls inside one dispatch, two N values differenced, so the
~30 ms axon round-trip cancels and wall jitter shrinks by the chain
length.

Usage: solver_lab.py [n] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.ops.jdiag import (  # noqa: E402
    _topk_extract,
    _topk_project,
    jdiag_topk_batched,
)
from apvast_tpu.ops.trisolve import triangular_inverse  # noqa: E402

Z, K, V, ITERS = 2, 64, 50, 2


def make_pencils(n, seed=0):
    """Synthetic covariance pencils with realistic conditioning: framed
    white noise Grams plus the production relative loading."""
    rng = np.random.default_rng(seed)
    y = rng.standard_normal((Z, n, max(2 * n // 3, 256))).astype(np.float32)
    a = jnp.asarray(y @ y.transpose(0, 2, 1))
    y2 = rng.standard_normal(y.shape).astype(np.float32)
    b = jnp.asarray(y2 @ y2.transpose(0, 2, 1))
    eye = jnp.eye(n, dtype=jnp.float32)
    # rank-deficient-ish dark matrix + trace-relative loading, like the
    # engine's effective_reg_b_relative path.
    tr = jnp.einsum("zii->z", b) / n
    b = b + (1e-6 * tr)[:, None, None] * eye
    q0 = jnp.asarray(rng.standard_normal((Z, n, K)).astype(np.float32))
    return a, b, q0


def chained(fn, operands, iters=(4, 16), reps=3):
    """Per-call device us via chained dependent calls. ``fn(ops) ->
    scalar-reducible pytree``; the scalar feeds back into the first
    operand so XLA cannot parallelize or dead-code the chain."""

    def run(ops, zero, n):
        def body(_, carry):
            ops, acc = carry
            s = fn(ops)
            first = ops[0] + zero * s
            return ((first,) + tuple(ops[1:]), acc + s)

        return jax.lax.fori_loop(0, n, body, (ops, jnp.float32(0.0)))[1]

    jr = jax.jit(run, static_argnums=2)
    zero = jnp.float32(0.0)
    out = {}
    for n in iters:
        float(jr(operands, zero, n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(jr(operands, zero, n))
            best = min(best, time.time() - t0)
        out[n] = best
    n1, n2 = iters
    return (out[n2] - out[n1]) / (n2 - n1) * 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    a, b, q0 = make_pencils(n)
    print(f"device: {jax.devices()[0].platform}  n={n} z={Z} k={K}", flush=True)

    reg = 0.0  # loading already applied in make_pencils

    def full(ops):
        aa, bb, qq = ops
        u, d, q, sil = jdiag_topk_batched(
            aa, bb, reg, V, ITERS, qq, "cholqr2", "invert", "jacobi", 2
        )
        return jnp.sum(u) + jnp.sum(d)

    def chol(ops):
        (bb,) = ops
        return jnp.sum(jnp.linalg.cholesky(bb))

    def cholinv(ops):
        (bb,) = ops
        c = jnp.linalg.cholesky(bb)
        return jnp.sum(triangular_inverse(c))

    li = jax.jit(lambda bb: triangular_inverse(jnp.linalg.cholesky(bb)))(b)

    def iteronly(ops):
        aa, ll, qq = ops
        small, q, wmat = jax.vmap(
            _topk_project, in_axes=(0, None, None, None, 0, None, None, 0)
        )(aa, b, reg, ITERS, qq, "cholqr2", "invert", ll)
        from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

        d, v = jacobi_eigh(small, sweeps=2)
        u, dd, ritz, sil = jax.vmap(
            _topk_extract, in_axes=(0, 0, 0, 0, None, 0, None)
        )(d, v, q, wmat, V, qq, "invert")
        return jnp.sum(u) + jnp.sum(dd)

    from apvast_tpu.ops.jdiag import jdiag_topk_tracked

    lam0 = jnp.zeros((Z, K), jnp.float32)

    def tracked(rebuild, li_in, basis="cholqr2"):
        def fn(ops):
            aa, bb, qq = ops
            u, d, q, lam, lio, sil, _ = jdiag_topk_tracked(
                aa, bb, reg, V, qq, lam0, li_in, rebuild, 1, "jacobi", 2,
                rr_basis=basis,
            )
            return jnp.sum(u) + jnp.sum(d)

        return fn

    rows = [
        ("full", full, (a, b, q0)),
        ("chol", chol, (b,)),
        ("cholinv", cholinv, (b,)),
        ("iter", iteronly, (a, li, q0)),
        ("trk", tracked(jnp.asarray(False), li), (a, b, q0)),
        ("trk_rb", tracked(jnp.asarray(True), li), (a, b, q0)),
        ("trk_direct", tracked(
            jnp.asarray(False), li, "direct"), (a, b, q0)),
        ("trk_bf16", tracked(
            jnp.asarray(False), li.astype(jnp.bfloat16)), (a, b, q0)),
    ]
    for blocks in (8, 32):
        rows.append(
            (
                f"inv{blocks}",
                (lambda blk: lambda ops: jnp.sum(
                    triangular_inverse(jnp.linalg.cholesky(ops[0]), blk)
                ))(blocks),
                (b,),
            )
        )
    for name, fn, ops in rows:
        try:
            us = chained(fn, ops)
            print(f"  {name:8s} {us:9.1f} us/call", flush=True)
        except Exception as exc:
            print(f"  {name:8s} FAILED: {str(exc)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
