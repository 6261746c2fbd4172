#!/usr/bin/env python
"""Per-stage device time of the tap-major lag assembly (chained
prefixes, tunnel-proof). Usage: lag_stages.py [nsrc]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.ops.lag_statistics import (
    _compute_c0,
    _shear_rows_dec,
    _shear_rows_neg,
)

J = 50


def build_prefixes(s, j):
    """Return {name: fn(buf) -> arrays} cumulative prefixes of
    covariance_via_lags_tap's pipeline."""
    cum_rev = jnp.asarray(np.tril(np.ones((j, j)))[::-1].copy(), jnp.float32)

    def pre_c0(buf):
        return (_compute_c0(buf, j, "pallas"),)

    def pre_edge(buf):
        c0 = _compute_c0(buf, j, "pallas")
        p4, m = buf.shape[0], buf.shape[1]
        k = buf.shape[-1] - j + 1
        zero_col = jnp.zeros_like(buf[..., :1])
        x1r = jnp.concatenate([zero_col, buf[..., k : k + j - 1]], -1)
        x1l = jnp.concatenate([zero_col, -buf[..., : j - 1]], -1)
        x2r = buf[..., k - 1 : k - 1 + j]
        x2l = jnp.concatenate([zero_col, buf[..., : j - 1]], -1)
        lhs = jnp.stack([x1r, x1l], axis=2).transpose(0, 1, 2, 4, 3)
        rhs = jnp.flip(jnp.stack([x2r, x2l], axis=2), axis=-1)
        rhs = rhs.transpose(0, 1, 2, 4, 3)
        lhs = lhs.reshape(p4, 2 * m, j, s)
        rhs = rhs.reshape(p4, 2 * m, j, s)
        o = jnp.einsum(
            "pcis,pcvt->pisvt", lhs, rhs, preferred_element_type=jnp.float32
        )
        return c0, o

    def pre_shearneg(buf):
        c0, o = pre_edge(buf)
        p4 = buf.shape[0]
        e_rev = _shear_rows_neg(o.reshape(p4, j, s * j * s), s)
        return c0, e_rev

    def pre_cumsum(buf):
        c0, e_rev = pre_shearneg(buf)
        p4 = buf.shape[0]
        t_f = jnp.einsum(
            "ai,piw->paw",
            cum_rev,
            e_rev,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(p4, j, s, j, s)
        return c0, t_f

    def pre_btab(buf):
        c0, t_f = pre_cumsum(buf)
        c0_t = c0.transpose(0, 1, 3, 2)
        b_tab = jnp.flip(c0_t, axis=2)[:, None] + t_f
        return (b_tab,)

    def pre_sheardec(buf):
        (b_tab,) = pre_btab(buf)
        p4 = buf.shape[0]
        low = _shear_rows_dec(
            b_tab.reshape(p4, j, s * j * s), s, s * j * s
        ).reshape(p4, j * s, j * s)
        return (low,)

    def pre_sym(buf):
        (low,) = pre_sheardec(buf)
        rows = np.arange(s * j) // s
        mask = jnp.asarray(rows[:, None] >= rows[None, :])
        return (jnp.where(mask, low, jnp.swapaxes(low, -1, -2)),)

    def pre_perm(buf):
        (r_tap,) = pre_sym(buf)
        p4 = buf.shape[0]
        return (
            r_tap.reshape(p4, j, s, j, s)
            .transpose(0, 2, 1, 4, 3)
            .reshape(p4, s * j, s * j),
        )

    return {
        "c0": pre_c0,
        "edge_einsum": pre_edge,
        "shear_neg": pre_shearneg,
        "cumsum_mm": pre_cumsum,
        "btab_add": pre_btab,
        "shear_dec": pre_sheardec,
        "symmetrize": pre_sym,
        "permute": pre_perm,
    }


def bench_chained(fn, buf, iters=(4, 24), reps=2):
    def run(b, zero, n):
        def body(_, carry):
            bb, acc = carry
            outs = fn(bb)
            sv = sum(jnp.sum(o) for o in outs)
            return (bb + zero * sv, acc + sv)

        return jax.lax.fori_loop(0, n, body, (b, jnp.float32(0.0)))[1]

    jr = jax.jit(run, static_argnums=2)
    zero = jnp.float32(0.0)
    res = {}
    for n in iters:
        float(jr(buf, zero, n))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(jr(buf, zero, n))
            best = min(best, time.time() - t0)
        res[n] = best
    lo, hi = iters
    return (res[hi] - res[lo]) / (hi - lo) * 1e6


def main():
    global s
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    s = nsrc
    m = nsrc + 1
    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.standard_normal((4, m, s, 999)), jnp.float32)
    print(f"device: {jax.devices()[0].platform}  s={s} m={m}", flush=True)
    prev = 0.0
    for name, fn in build_prefixes(s, J).items():
        us = bench_chained(fn, buf)
        print(f"  thru {name:12s} {us:8.1f} us  (+{us - prev:7.1f})", flush=True)
        prev = us
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
