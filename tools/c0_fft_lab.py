#!/usr/bin/env python
"""Chained-differencing A/B of the C0 correlation stage: the Pallas
shift-stack kernel vs the half-spectrum DFT-matmul formulation
(`_c0_fft`). The Pallas grid step is VMEM-bandwidth-bound on the stack
build; the FFT route trades it for large MXU matmuls plus (4, M, S, F)
spectra in HBM — this tool measures which side of the trade wins per
geometry.

Usage: c0_fft_lab.py [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.ops.lag_statistics import _c0_fft  # noqa: E402
from apvast_tpu.ops.pallas.lag_corr import lag_corr_pallas  # noqa: E402


def chained(fn, buf, iters=(8, 58), reps=3):
    def run(b, zero, n):
        def body(_, carry):
            bb, acc = carry
            s = jnp.sum(fn(bb))
            return (bb + zero * s, acc + s)

        return jax.lax.fori_loop(0, n, body, (b, jnp.float32(0.0)))[1]

    jr = jax.jit(run, static_argnums=2)
    zero = jnp.float32(0.0)
    walls = {}
    for n in iters:
        float(jr(buf, zero, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(jr(buf, zero, n))
            best = min(best, time.time() - t0)
        walls[n] = best
    return (walls[iters[1]] - walls[iters[0]]) / (iters[1] - iters[0]) * 1e6


def main():
    j = 50
    print(f"device: {jax.devices()[0].platform}", flush=True)
    for name, (m, s, n) in (
        ("north-star (S+1=17)", (17, 17, 999)),
        ("tpu-scale (S+1=33)", (33, 33, 999)),
    ):
        rng = np.random.default_rng(1)
        buf = jnp.asarray(rng.standard_normal((4, m, s, n)), jnp.float32)
        interp = jax.default_backend() == "cpu"
        cases = {
            "pallas": lambda b: lag_corr_pallas(b, j, interpret=interp),
            "fft": lambda b: _c0_fft(b, j),
        }
        out = {}
        for nm, fn in cases.items():
            per = chained(fn, buf)
            got = fn(buf)
            out[nm] = (per, got)
            print(f"  {name} {nm:7s} {per:8.1f} us/call", flush=True)
        err = float(
            jnp.max(jnp.abs(out["fft"][1] - out["pallas"][1]))
            / jnp.max(jnp.abs(out["pallas"][1]))
        )
        print(f"  {name} fft vs pallas rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
