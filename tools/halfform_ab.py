#!/usr/bin/env python
"""Sustained 32-spk A/B: blessed tracking point vs statistics_half_form
(+ residual rebuild). Mirrors bench.py's tpu-scale child measurement
(128-hop run_stream, best/median of reps) so the number is directly
comparable to tpu_scale_per_hop_ms.
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.config import production_overrides  # noqa: E402
from apvast_tpu.engine import build_plan, init_state, run_stream  # noqa: E402
from apvast_tpu.utils.scenes import scale_scene  # noqa: E402

HOP_SECONDS = 800.0 / 48000.0


def main():
    nh = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cases = [
        ("blessed", {}),  # r5: T16 + half-form
        ("T32", dict(tracking_rebuild_period=32)),
        # Residual threshold calibrated by tools/resid_profile.py
        # (stationary band 0.6-1.4, +20 dB step spikes ~3.1).
        ("T32 r2.5", dict(tracking_rebuild_period=32,
                          tracking_residual_rebuild=2.5)),
    ]
    for nm, extra in cases:
        over = production_overrides()
        over.update(extra)
        sc = scale_scene(32, **over)
        cfg = sc.config
        plan = build_plan(cfg, sc.rir_a, sc.rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        rng = np.random.default_rng(0)
        sig_a = jnp.asarray(rng.standard_normal(cfg.hop * nh),
                            dtype=jnp.float32)
        sig_b = jnp.asarray(rng.standard_normal(cfg.hop * nh),
                            dtype=jnp.float32)

        def run(state):
            state, outs = run_stream(cfg, plan, state, sig_a, sig_b)
            return (jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32)),
                    jnp.sum(outs.silenced))

        rj = jax.jit(run)
        t0 = time.time()
        chk, sil = map(float, rj(state))
        print(f"{nm}: compile+first {time.time() - t0:.0f}s "
              f"chk finite={np.isfinite(chk)} sil={int(sil)}", flush=True)
        times = []
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(rj(state)[0])
            times.append(time.time() - t0)
        best = min(times) / nh * 1000
        med = float(np.median(times)) / nh * 1000
        print(f"{nm}: best {best:.3f} ms/hop (RTF {HOP_SECONDS*1000/best:.2f}"
              f"x)  median {med:.3f} ms/hop", flush=True)


if __name__ == "__main__":
    main()
