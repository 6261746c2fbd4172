#!/usr/bin/env python
"""CPU quality gates for the round-3 candidates (lag statistics, Newton
whitening) at any scene size.

Runs the float32 engine with the NON-Pallas data paths (conv/output/
statistics execute the numerically-equivalent XLA variants — the Pallas
kernels are exactness-tested separately, and interpret mode at JL=1600
would take hours), so the deltas isolate the statistics variant and the
solver: exactly the quantities the candidates change.

Usage: r3_quality_cpu.py [nsrc] [hops]
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax

jax.config.update("jax_platforms", "cpu")

from solver_knobs import contrasts  # noqa: E402

from apvast_tpu.config import GevdSolver, production_overrides  # noqa: E402
from apvast_tpu.engine import build_plan  # noqa: E402
from apvast_tpu.utils.scenes import scale_scene  # noqa: E402


CANDIDATES = {
    "einsum+invert": {},
    "einsum+newton": dict(subspace_whiten="newton"),
    "lag+invert": dict(use_lag_statistics=True),
    "lag+newton": dict(use_lag_statistics=True, subspace_whiten="newton"),
    "skew+invert": dict(use_lag_statistics=True, lag_assembly="skew"),
}


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import solver_knobs

    solver_knobs.HOPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # Blessed CPU production config with ONE deviation: keep the
    # matmul-DFT data path ON so the gated graph matches the TPU
    # engine's FFT-free data path (interpret-mode-exact on CPU).
    scene = scale_scene(
        nsrc,
        **{**production_overrides("cpu"), "use_matmul_dft": True},
    )
    base = scene.config
    plan = build_plan(base, scene.rir_a, scene.rir_b)
    ranks = [0, base.num_eigenvectors - 1]
    print(f"device: {jax.devices()[0].platform}  srcs={nsrc}", flush=True)

    exact_cfg = dataclasses.replace(base, gevd_solver=GevdSolver.EIGH)
    exact = contrasts(exact_cfg, plan, scene.rir_a, scene.rir_b, ranks)
    print(
        f"exact: rank1 {exact[ranks[0]]:.3f} rankV {exact[ranks[1]]:.3f}",
        flush=True,
    )

    for name, over in CANDIDATES.items():
        cfg = dataclasses.replace(base, **over)
        try:
            c = contrasts(cfg, plan, scene.rir_a, scene.rir_b, ranks)
            d1 = abs(c[ranks[0]] - exact[ranks[0]])
            dv = abs(c[ranks[1]] - exact[ranks[1]])
            ok = d1 < 0.25 and dv < 0.25
            print(
                f"  {name:14s} delta1 {d1:.4f} deltaV {dv:.4f} "
                f"[{'OK' if ok else 'FAIL'}]",
                flush=True,
            )
        except Exception as exc:
            print(f"  {name:14s} FAILED: {str(exc)[:180]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
