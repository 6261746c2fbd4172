#!/usr/bin/env python
"""How much of the sustained wall-clock is per-dispatch overhead?

Measures the production north-star stream at several hops-per-dispatch
lengths: if wall/hop falls as NH grows, the gap between wall and the
XPlane device time is fixed dispatch cost, and bench.py should measure
at the flat part of the curve.

Usage: nh_sweep.py [nsrc]
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

from apvast_tpu.config import GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, run_stream
from apvast_tpu.utils.scenes import scale_scene

REPS = 6


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(
        nsrc,
        **production_overrides(),
    )
    cfg = scene.config
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    print(f"device: {jax.devices()[0].platform}  srcs={nsrc}", flush=True)

    for nh in (64, 128, 256, 512):
        state = init_state(cfg, key=jax.random.key(0))
        rng = np.random.default_rng(0)
        sig_a = jnp.asarray(
            rng.standard_normal(cfg.hop * nh), dtype=jnp.float32
        )
        sig_b = jnp.asarray(
            rng.standard_normal(cfg.hop * nh), dtype=jnp.float32
        )

        def run(st, a=sig_a, b=sig_b):
            st, outs = run_stream(cfg, plan, st, a, b)
            return jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

        runj = jax.jit(run)
        try:
            t0 = time.time()
            float(runj(state))
            compile_s = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                float(runj(state))
                times.append(time.time() - t0)
            times.sort()
            best = times[0] / nh * 1000
            med = times[len(times) // 2] / nh * 1000
            rtf = (cfg.hop / 48.0) / best
            print(
                f"  NH={nh:4d} compile {compile_s:6.1f}s  "
                f"best {best:6.3f} ms/hop (RTF {rtf:5.2f}x)  "
                f"median {med:6.3f} ms/hop",
                flush=True,
            )
        except Exception as exc:
            print(f"  NH={nh:4d} FAILED: {str(exc)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
