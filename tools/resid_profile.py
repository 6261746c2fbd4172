#!/usr/bin/env python
"""Per-hop Ritz-residual profile of the tracking solver — calibrates
config.tracking_residual_rebuild (the staleness fallback threshold).

Runs the 32-spk scene hop by hop on the production config, printing the
carried relative block-residual each hop, with a +20 dB level step
injected mid-stream. The threshold must sit ABOVE the stationary
steady-state band (or the trigger degenerates into rebuild-every-hop —
measured 3.25 vs 2.12 ms/hop at threshold 0.35) and BELOW the step
spike.

Usage: resid_profile.py [nsrc] [num_hops] [rebuild_period] [jacobi_sweeps]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.config import production_overrides  # noqa: E402
from apvast_tpu.engine import build_plan, init_state, process_hop  # noqa: E402
from apvast_tpu.utils.scenes import scale_scene  # noqa: E402


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nh = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    period = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    over = production_overrides()
    over.update(tracking_rebuild_period=period)
    if len(sys.argv) > 4:
        over.update(jacobi_sweeps=int(sys.argv[4]))
    sc = scale_scene(nsrc, **over)
    cfg = sc.config
    plan = build_plan(cfg, sc.rir_a, sc.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    sig_a = rng.standard_normal(cfg.hop * nh).astype(np.float32)
    sig_b = rng.standard_normal(cfg.hop * nh).astype(np.float32)
    # +20 dB level step at 2/3 of the stream.
    step = (2 * nh // 3) * cfg.hop
    sig_a[step:] *= 10.0
    sig_b[step:] *= 10.0

    fn = jax.jit(lambda st, a, b: process_hop(cfg, plan, st, a, b))
    print(f"nsrc={nsrc} T={period} warmup={cfg.tracking_warmup_hops} "
          f"step at hop {2 * nh // 3}", flush=True)
    for h in range(nh):
        a = jnp.asarray(sig_a[h * cfg.hop:(h + 1) * cfg.hop])
        b = jnp.asarray(sig_b[h * cfg.hop:(h + 1) * cfg.hop])
        state, out = fn(state, a, b)
        r = float(state.gevd_resid) if state.gevd_resid is not None else -1
        sil = int(out.silenced)
        print(f"hop {h:4d} resid {r:10.5f} sil {sil}", flush=True)


if __name__ == "__main__":
    main()
