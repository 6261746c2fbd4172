#!/usr/bin/env python
"""Sustained north-star RTF for candidate production configs.

Compares the current production config against the two round-3 levers
(truncated-kernel weighting conv, tap-major lag statistics) and their
combination, each as a 128-hop jitted stream — the same measurement
bench.py's north-star child records. Prints one line per landing so
partial output survives a tunnel wedge.
"""

from __future__ import annotations

import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.config import GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, run_stream
from apvast_tpu.utils.scenes import scale_scene

NH = 128
REPS = 4


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(
        nsrc,
        **production_overrides(),
    )
    base = scene.config
    print(f"device: {jax.devices()[0].platform}  srcs={base.num_srcs}", flush=True)

    candidates = {
        "production(r2)": {},
        "lagwide": dict(use_lag_statistics=True, use_pallas_statistics=False),
        "lagwide+sw2": dict(
            use_lag_statistics=True,
            use_pallas_statistics=False,
            jacobi_sweeps=2,
        ),
        "prod+sw2": dict(jacobi_sweeps=2),
    }

    rng = np.random.default_rng(0)
    sig_a = jnp.asarray(rng.standard_normal(base.hop * NH), dtype=jnp.float32)
    sig_b = jnp.asarray(rng.standard_normal(base.hop * NH), dtype=jnp.float32)
    plan = build_plan(base, scene.rir_a, scene.rir_b)

    for name, over in candidates.items():
        cfg = dataclasses.replace(base, **over)
        state = init_state(cfg, key=jax.random.key(0))

        def run(st, c=cfg):
            st, outs = run_stream(c, plan, st, sig_a, sig_b)
            return jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

        runj = jax.jit(run)
        try:
            t0 = time.time()
            float(runj(state))  # compile + first run
            print(f"  {name:16s} compile+first {time.time()-t0:7.1f}s", flush=True)
            times = []
            for _ in range(REPS):
                t0 = time.time()
                float(runj(state))
                times.append(time.time() - t0)
            times.sort()
            best = times[0] / NH * 1000
            med = times[len(times) // 2] / NH * 1000
            rtf = (cfg.hop / 48.0) / best
            rtf_med = (cfg.hop / 48.0) / med
            print(
                f"  {name:16s} best {best:6.3f} ms/hop RTF {rtf:5.2f}x"
                f"   median {med:6.3f} ms/hop RTF {rtf_med:5.2f}x",
                flush=True,
            )
        except Exception as exc:
            print(f"  {name:16s} FAILED: {str(exc)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
