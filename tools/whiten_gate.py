#!/usr/bin/env python
"""Quality gate + sustained speed for use_pallas_whiten (the fused
Cholesky+inverse whitening-setup kernel, ops/pallas/whiten.py) vs the
XLA custom-call chain, on the north-star scene."""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from solver_knobs import contrasts, sustained  # noqa: E402

from apvast_tpu.config import GevdSolver, production_overrides  # noqa: E402
from apvast_tpu.engine import build_plan  # noqa: E402
from apvast_tpu.utils.scenes import scale_scene  # noqa: E402


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(nsrc, **production_overrides())
    base = scene.config
    plan = build_plan(base, scene.rir_a, scene.rir_b)
    ranks = [0, base.num_eigenvectors - 1]
    print(f"device: {jax.devices()[0].platform}", flush=True)

    exact_cfg = dataclasses.replace(
        base,
        gevd_solver=GevdSolver.EIGH,
        use_lag_statistics=False,
        use_pallas_statistics=True,
        use_pallas_whiten=False,
    )
    exact = contrasts(exact_cfg, plan, scene.rir_a, scene.rir_b, ranks)
    print(
        f"exact: rank1 {exact[0]:.3f} rankV {exact[ranks[1]]:.3f}", flush=True
    )

    for name, over in (
        ("xla_chain", dict(use_pallas_whiten=False)),
        ("pallas_whiten", dict(use_pallas_whiten=True)),
    ):
        cfg = dataclasses.replace(base, **over)
        try:
            c = contrasts(cfg, plan, scene.rir_a, scene.rir_b, ranks)
            d1 = abs(c[0] - exact[0])
            dv = abs(c[ranks[1]] - exact[ranks[1]])
            ok = d1 < 0.25 and dv < 0.25
            ms = sustained(cfg, plan)
            print(
                f"  {name:14s} delta1 {d1:.4f} deltaV {dv:.4f} "
                f"[{'OK' if ok else 'FAIL'}]  {ms:.3f} ms/hop",
                flush=True,
            )
        except Exception as exc:
            print(f"  {name:14s} FAILED: {str(exc)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
