#!/usr/bin/env python
"""Standalone micro-benchmarks for north-star kernel optimizations.

Compares covariance-kernel variants (full dot / symmetric block-triangular
/ bf16 windows) and small-eigh strategies (EighTpu vs Pallas Jacobi) on
the 16-speaker scene shapes, printing ms per hop-equivalent and max
relative error vs the f64 oracle.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, reps=50):
    out = jax.tree.leaves(fn(*args))[0]
    jnp.sum(jnp.abs(out.astype(jnp.float32))).block_until_ready()
    float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    t0 = time.time()
    for _ in range(reps):
        out = jax.tree.leaves(fn(*args))[0]
    float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:55s} {dt:8.3f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- variants
def make_cov(variant, p, m, s, n, j):
    k = n - j + 1
    sj = s * j

    def fill_windows(buf_ref, windows, dtype):
        for sv in range(s):
            for i in range(j):
                start = j - 1 - i
                row = buf_ref[0, 0, sv, start : start + k]
                windows[sv * j + i, :] = row.astype(dtype)

    if variant == "full_f32":
        wdtype = jnp.float32
        def kernel(buf_ref, d_ref, out_ref, out_r_ref, windows):
            mi = pl.program_id(1)
            fill_windows(buf_ref, windows, wdtype)
            tile = jax.lax.dot_general(
                windows[:], windows[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            r_tile = jax.lax.dot_general(
                windows[:], d_ref[0].astype(wdtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            @pl.when(mi == 0)
            def _():
                out_ref[0] = tile
                out_r_ref[0] = r_tile
            @pl.when(mi > 0)
            def _():
                out_ref[0] = out_ref[0] + tile
                out_r_ref[0] = out_r_ref[0] + r_tile
        needs_mirror = False
    elif variant.startswith(("full_", "sym")):
        wdtype = jnp.bfloat16 if "bf16" in variant else jnp.float32
        if variant.startswith("sym"):
            nb = int(variant.split("_")[0][3:] or "2")
        else:
            nb = 0
        def kernel(buf_ref, d_ref, out_ref, out_r_ref, windows):
            mi = pl.program_id(1)
            fill_windows(buf_ref, windows, wdtype)
            w = windows[:]
            if nb:
                bs = sj // nb
                rows = []
                for bi in range(nb):
                    wi = windows[bi * bs : (bi + 1) * bs, :]
                    row = []
                    for bj in range(bi + 1):
                        wjj = windows[bj * bs : (bj + 1) * bs, :]
                        row.append(jax.lax.dot_general(
                            wi, wjj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    if bi + 1 < nb:
                        row.append(jnp.zeros((bs, (nb - bi - 1) * bs),
                                             jnp.float32))
                    rows.append(jnp.concatenate(row, axis=1))
                tile = jnp.concatenate(rows, axis=0)
            else:
                tile = jax.lax.dot_general(
                    w, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            r_tile = jax.lax.dot_general(
                w, d_ref[0].astype(wdtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            @pl.when(mi == 0)
            def _():
                out_ref[0] = tile
                out_r_ref[0] = r_tile
            @pl.when(mi > 0)
            def _():
                out_ref[0] = out_ref[0] + tile
                out_r_ref[0] = out_r_ref[0] + r_tile
        needs_mirror = variant.startswith("sym")
    else:
        raise ValueError(variant)

    buf_spec = pl.BlockSpec((1, 1, s, n), lambda pi, mi: (pi, mi, 0, 0),
                            memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, 2, k), lambda pi, mi: (mi, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, sj, sj), lambda pi, mi: (pi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_r_spec = pl.BlockSpec((1, sj, 2), lambda pi, mi: (pi, 0, 0),
                              memory_space=pltpu.VMEM)
    wdtype = jnp.bfloat16 if "bf16" in variant else jnp.float32

    def call(buffers, d_by_mic):
        r_mats, r_cross = pl.pallas_call(
            kernel,
            grid=(p, m),
            in_specs=[buf_spec, d_spec],
            out_specs=(out_spec, out_r_spec),
            out_shape=(
                jax.ShapeDtypeStruct((p, sj, sj), jnp.float32),
                jax.ShapeDtypeStruct((p, sj, 2), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((sj, k), wdtype)],
            cost_estimate=pl.CostEstimate(
                flops=2 * p * m * sj * (sj + 2) * k,
                bytes_accessed=p * m * s * n * 4 + p * sj * sj * 4,
                transcendentals=0,
            ),
        )(buffers, d_by_mic)
        if needs_mirror:
            low = jnp.tril(r_mats)
            r_mats = low + jnp.triu(low.transpose(0, 2, 1), 1)
        return r_mats, r_cross

    return call


def main():
    p, m, s, n, j = 4, 17, 16, 999, 50
    k = n - j + 1
    rng = np.random.default_rng(0)
    buffers = jnp.asarray(rng.standard_normal((p, m, s, n)), jnp.float32)
    d_by_mic = jnp.asarray(rng.standard_normal((m, 2, k)), jnp.float32)

    # float64 oracle on CPU-ish via numpy
    bufs64 = np.asarray(buffers, np.float64)
    wins = np.stack([
        np.stack([bufs64[pi, mi, sv, j - 1 - i : j - 1 - i + k]
                  for sv in range(s) for i in range(j)])
        for pi in range(p) for mi in range(m)
    ]).reshape(p, m, s * j, k)
    ref = np.einsum("pmak,pmbk->pab", wins, wins)

    variants = ["full_f32", "sym2_f32", "sym4_f32", "sym8_f32", "sym8_bf16"]
    fns = {}
    for variant in variants:
        fn = jax.jit(make_cov(variant, p, m, s, n, j))
        r_mats, _ = fn(buffers, d_by_mic)
        err = np.max(np.abs(np.asarray(r_mats, np.float64) - ref)) / np.max(
            np.abs(ref))
        print(f"{variant}: max rel err vs f64 {err:.2e}", flush=True)
        fns[variant] = fn

    best = {v: float("inf") for v in variants}
    for rounds in range(5):
        for v in variants:
            t0 = time.time()
            for _ in range(20):
                out = fns[v](buffers, d_by_mic)[0]
            float(jnp.sum(jnp.abs(out)))
            best[v] = min(best[v], (time.time() - t0) / 20 * 1000)
    for v in variants:
        print(f"cov {v:12s} min {best[v]:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
