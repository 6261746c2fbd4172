#!/usr/bin/env python
"""Round-3 candidate matrix: sustained speed of the statistics-engine x
whitening-mode combinations on a scale scene.

Usage: r3_matrix.py [nsrc] [quality]

Candidates (all production solver, validated per-combo by the 0.25 dB
gate when ``quality`` is passed):
  - panel+invert   : round-2 production (Pallas covariance, per-hop
                     Cholesky + matmul triangular inversion)
  - panel+newton   : carried Newton-Schulz inverse, no per-hop Cholesky
  - lag+invert     : lag-domain statistics (source-major), O(S^2 lags K)
                     instead of O((SJ)^2 K) covariance
  - lag+newton     : both levers

Prints one line per landing so partial output survives a tunnel wedge.
"""

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


# NOTE: production defaults now INCLUDE the skew lag statistics, so the
# dense candidate must disable them explicitly — a bare {} candidate
# silently measured skew three times over after the default switch.
CANDIDATES = {
    "production(skew)": {},
    "pallas+invert": dict(use_lag_statistics=False),
    "lagwide+invert": dict(
        use_lag_statistics=True,
        use_pallas_statistics=False,
        lag_assembly="wide",
    ),
}


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    quality = len(sys.argv) > 2 and sys.argv[2] == "quality"
    scene = scale_scene(
        nsrc,
        **production_overrides(),
    )
    base = scene.config
    plan = build_plan(base, scene.rir_a, scene.rir_b)
    ranks = [0, base.num_eigenvectors - 1]
    print(f"device: {jax.devices()[0].platform}  srcs={nsrc}", flush=True)

    exact = None
    if quality:
        exact_cfg = dataclasses.replace(base, gevd_solver=GevdSolver.EIGH)
        exact = contrasts(exact_cfg, plan, scene.rir_a, scene.rir_b, ranks)
        print(
            f"exact: rank1 {exact[ranks[0]]:.3f} rankV {exact[ranks[1]]:.3f}",
            flush=True,
        )

    for name, over in CANDIDATES.items():
        cfg = dataclasses.replace(base, **over)
        try:
            gate = ""
            if exact is not None:
                c = contrasts(cfg, plan, scene.rir_a, scene.rir_b, ranks)
                d1 = abs(c[ranks[0]] - exact[ranks[0]])
                dv = abs(c[ranks[1]] - exact[ranks[1]])
                ok = d1 < 0.25 and dv < 0.25
                gate = (
                    f"delta1 {d1:.4f} deltaV {dv:.4f} "
                    f"[{'OK' if ok else 'FAIL'}]  "
                )
            ms = sustained(cfg, plan)
            rtf = (cfg.hop / 48.0) / ms
            print(
                f"  {name:14s} {gate}{ms:6.3f} ms/hop  RTF {rtf:5.2f}x",
                flush=True,
            )
        except Exception as exc:
            print(f"  {name:14s} FAILED: {str(exc)[:180]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
