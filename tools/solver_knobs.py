#!/usr/bin/env python
"""Quality + speed sweep of the GEVD solver knobs on the north-star scene.

For each (subspace_iters, jacobi_sweeps, oversample) candidate: contrast
deltas vs the exact eigh engine at rank 1 and rank V (the 0.25 dB
production gate), plus the sustained stream rate. Prints one line per
landing so partial output survives a wedge.
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

from apvast_tpu.config import GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, process_hop, run_stream
from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
from apvast_tpu.utils.scenes import scale_scene

HOPS = 12
NH = 128
REPS = 3


def contrasts(cfg, plan, rir_a, rir_b, ranks):
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(4)
    outs = []
    silenced = 0
    for _ in range(HOPS):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
        )
        outs.append(np.asarray(out.out_a))
        silenced += int(out.silenced)
    assert silenced == 0, f"{silenced} outputs silenced"
    res = {}
    for r in ranks:
        feeds = np.concatenate([o[r] for o in outs[HOPS // 2 :]], axis=0)
        res[r] = float(
            acoustic_contrast_db(
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
            )
        )
    return res


def sustained(cfg, plan):
    state = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    sig_a = jnp.asarray(rng.standard_normal(cfg.hop * NH), dtype=jnp.float32)
    sig_b = jnp.asarray(rng.standard_normal(cfg.hop * NH), dtype=jnp.float32)

    def run(st):
        st, outs = run_stream(cfg, plan, st, sig_a, sig_b)
        return jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

    runj = jax.jit(run)
    float(runj(state))
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        float(runj(state))
        best = min(best, time.time() - t0)
    return best / NH * 1000


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(
        nsrc,
        **production_overrides(),
    )
    base = scene.config
    plan = build_plan(base, scene.rir_a, scene.rir_b)
    ranks = [0, base.num_eigenvectors - 1]
    print(f"device: {jax.devices()[0].platform}", flush=True)

    exact_cfg = dataclasses.replace(
        base,
        gevd_solver=GevdSolver.EIGH,
        use_lag_statistics=False,
        use_pallas_statistics=True,
    )
    exact = contrasts(exact_cfg, plan, scene.rir_a, scene.rir_b, ranks)
    print(
        f"exact eigh: rank1 {exact[ranks[0]]:.3f} rankV {exact[ranks[1]]:.3f}",
        flush=True,
    )

    for iters, sweeps, overs in (
        (2, 3, 14),
        (2, 2, 14),
        (2, 2, 18),
        (2, 2, 22),
    ):
        cfg = dataclasses.replace(
            base,
            subspace_iters=iters,
            jacobi_sweeps=sweeps,
            subspace_oversample=overs,
        )
        name = f"it{iters}_sw{sweeps}_ov{overs}"
        try:
            c = contrasts(cfg, plan, scene.rir_a, scene.rir_b, ranks)
            d1 = abs(c[ranks[0]] - exact[ranks[0]])
            dv = abs(c[ranks[1]] - exact[ranks[1]])
            ok = d1 < 0.25 and dv < 0.25
            ms = sustained(cfg, plan)
            print(
                f"  {name:16s} delta1 {d1:.4f} deltaV {dv:.4f} "
                f"[{'OK' if ok else 'FAIL'}]  {ms:.3f} ms/hop",
                flush=True,
            )
        except Exception as exc:
            print(f"  {name:16s} FAILED: {str(exc)[:140]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
