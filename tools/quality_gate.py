#!/usr/bin/env python
"""Quality gate: production config vs exact eigh solver, rank-1 and
rank-top contrast on a scene (default north-star 16-speaker).

Usage: quality_gate.py [nsrc] [hops]
Prints contrast pairs and asserts |delta| < 0.25 dB.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from apvast_tpu.config import GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
from apvast_tpu.utils.scenes import reference_scene, scale_scene


def contrasts(cfg, rir_a, rir_b, hops, ranks):
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(4)
    outs = []
    silenced = 0
    for _ in range(hops):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
        )
        outs.append(np.asarray(out.out_a))
        silenced += int(out.silenced)
    # Gate on the NaN-guard counter: a conditioning blowup zeroed into
    # silence shrinks contrast on BOTH solvers symmetrically, so the
    # contrast deltas alone would not catch it (VERDICT r2 weak #5).
    assert silenced == 0, f"{silenced} solver outputs silenced by NaN guards"
    res = {}
    warm = hops // 2
    for r in ranks:
        feeds = np.concatenate([o[r] for o in outs[warm:]], axis=0)
        res[r] = float(
            acoustic_contrast_db(
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
            )
        )
    return res


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hops = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if nsrc == 8:
        scene = reference_scene()
    else:
        scene = scale_scene(nsrc)
    cfg = scene.config
    ranks = [0, cfg.num_eigenvectors - 1]

    # The blessed production configuration, from the single source of
    # truth bench.py measures (config.production_overrides) — a hand
    # copy here could silently gate a config bench.py no longer runs.
    prod_over = production_overrides()
    if len(sys.argv) > 3:
        prod_over["jacobi_sweeps"] = int(sys.argv[3])

    # Exact solver with the FULL Pallas/matmul-DFT data path: the only
    # difference vs production is the solver itself — and the tunnel
    # rejects the composed FFT-path graph with UNIMPLEMENTED, so the
    # FFT-free data path is also what makes the exact engine runnable
    # on TPU at all.
    data_path = {k: v for k, v in prod_over.items() if k.startswith("use_")}
    exact_cfg = dataclasses.replace(
        cfg, gevd_solver=GevdSolver.EIGH, **data_path
    )
    exact = contrasts(exact_cfg, scene.rir_a, scene.rir_b, hops, ranks)
    print(f"exact eigh: rank1 {exact[ranks[0]]:.3f} dB, "
          f"rank{ranks[1]+1} {exact[ranks[1]]:.3f} dB", flush=True)

    prod_cfg = dataclasses.replace(cfg, **prod_over)
    prod = contrasts(prod_cfg, scene.rir_a, scene.rir_b, hops, ranks)
    print(f"production: rank1 {prod[ranks[0]]:.3f} dB, "
          f"rank{ranks[1]+1} {prod[ranks[1]]:.3f} dB", flush=True)
    ok = True
    for r in ranks:
        delta = abs(exact[r] - prod[r])
        passed = delta < 0.25
        ok = ok and passed
        print(
            f"rank {r+1}: delta {delta:.4f} dB "
            f"[{'OK' if passed else 'FAIL'}]",
            flush=True,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
