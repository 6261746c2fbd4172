#!/usr/bin/env python
"""Hop-by-hop state probe across a silence gap at TPU scale — localizes
the permanent poisoning the 32-spk tracking horizon gate found
(output stays zero for 768 hops after a silence segment while exact
eigh recovers immediately).

Usage: silence_probe.py [nsrc] [--t PERIOD] [--resid T]
Signal: 10 hops noise @1.0, 8 hops @0.1, 10 hops TRUE silence,
12 hops @3.16 — the horizon schedule's failure neighborhood.
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
    over = production_overrides()
    sc = scale_scene(nsrc, **over)
    cfg = sc.config
    plan = build_plan(cfg, sc.rir_a, sc.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    hop = cfg.hop
    levels = [1.0] * 10 + [0.1] * 8 + [0.0] * 10 + [3.16] * 12

    fn = jax.jit(lambda st, a, b: process_hop(cfg, plan, st, a, b))
    print(f"nsrc={nsrc} T={cfg.tracking_rebuild_period} "
          f"resid_t={cfg.tracking_residual_rebuild}", flush=True)
    for h, lv in enumerate(levels):
        a = (lv * rng.standard_normal(hop)).astype(np.float32)
        b = (lv * rng.standard_normal(hop)).astype(np.float32)
        state, out = fn(state, jnp.asarray(a), jnp.asarray(b))
        leaves = {}
        for nm in ("gevd_q", "gevd_lam", "gevd_minv"):
            v = getattr(state, nm, None)
            if v is not None:
                leaves[nm] = (
                    int(jnp.isfinite(v).all()),
                    float(jnp.abs(v).max()),
                    float(jnp.abs(v).min()),
                )
        r = float(state.gevd_resid) if state.gevd_resid is not None else -1
        print(
            f"hop {h:3d} lvl {lv:4.2f} sil {int(out.silenced):8d} "
            f"omax {float(jnp.abs(out.out_a).max()):9.2e} resid {r:9.3f} "
            + " ".join(
                f"{nm}[fin={f} max={mx:.2e} min={mn:.2e}]"
                for nm, (f, mx, mn) in leaves.items()
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
