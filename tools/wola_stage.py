#!/usr/bin/env python
"""Device time of the WOLA weighting round trip (stages 2+3) standalone.

Chained-prefix measurement (tunnel-proof differencing) of:
  a. analysis: matmul-DFT of the (4, m, s, block) responses
  b. + perceptual weighting of target + response spectra
  c. + synthesis back to time domain
  d. + overlap-add and statistics-buffer slides

Usage: wola_stage.py [nsrc]
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

from apvast_tpu.config import GevdSolver
from apvast_tpu.engine import build_plan
import apvast_tpu.engine.hop as H
from apvast_tpu.ops.wola import slide, wola_overlap_add_tail
from apvast_tpu.utils.scenes import scale_scene


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(
        nsrc,
        gevd_solver=GevdSolver.SUBSPACE,
        use_matmul_dft=True,
    )
    cfg = scene.config
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    m, s, block, hop = cfg.num_mics, cfg.num_srcs, cfg.block_size, cfg.hop
    rng = np.random.default_rng(0)
    resp = jnp.asarray(
        1e-3 * rng.standard_normal((4, m, s, block)), jnp.float32
    )
    tresp = jnp.asarray(
        1e-3 * rng.standard_normal((2, m, block)), jnp.float32
    )
    wov = jnp.zeros((4, m, s, block - hop), jnp.float32)
    stat = jnp.zeros((4, m, s, cfg.statistics_buffer_length), jnp.float32)

    def pre_analysis(r, t):
        return (jnp.abs(H._analyze(cfg, plan, r)),)

    def pre_weight(r, t):
        wt_spec, r_spec, _ = H.weighted_spectra(cfg, plan, r, t)
        return jnp.abs(wt_spec), jnp.abs(r_spec)

    def pre_synth(r, t):
        wt_spec, r_spec, _ = H.weighted_spectra(cfg, plan, r, t)
        return (
            H._synthesize(cfg, plan, r_spec, block),
            H._synthesize(cfg, plan, wt_spec, block),
        )

    def pre_slides(r, t):
        wt_spec, r_spec, _ = H.weighted_spectra(cfg, plan, r, t)
        new_wr = H._synthesize(cfg, plan, r_spec, block)
        ov, emit = wola_overlap_add_tail(wov, new_wr, hop)
        st = slide(stat, emit)
        return ov, st

    def bench(fn, iters=(4, 24), reps=2):
        def run(r, t, zero, n):
            def body(_, carry):
                rr, acc = carry
                outs = fn(rr, t)
                sv = sum(jnp.sum(jnp.abs(o).astype(jnp.float32)) for o in outs)
                return (rr + zero * sv, acc + sv)

            return jax.lax.fori_loop(0, n, body, (r, jnp.float32(0.0)))[1]

        jr = jax.jit(run, static_argnums=3)
        zero = jnp.float32(0.0)
        res = {}
        for n in iters:
            float(jr(resp, tresp, zero, n))
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                float(jr(resp, tresp, zero, n))
                best = min(best, time.time() - t0)
            res[n] = best
        lo, hi = iters
        return (res[hi] - res[lo]) / (hi - lo) * 1e6

    print(f"device: {jax.devices()[0].platform}  srcs={nsrc}", flush=True)
    prev = 0.0
    for name, fn in (
        ("analysis", pre_analysis),
        ("weighting", pre_weight),
        ("synthesis", pre_synth),
        ("slides", pre_slides),
    ):
        us = bench(fn)
        print(f"  thru {name:10s} {us:8.1f} us  (+{us - prev:7.1f})", flush=True)
        prev = us
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
