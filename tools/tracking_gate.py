#!/usr/bin/env python
"""Quality gate for the tracking GEVD solver at TPU scale.

Runs the 32-speaker (JL = 1600) scene through the REAL engine on the
TPU with (a) the exact dense-eigh solver, (b) the production 'invert'
subspace solver, and (c) tracking-solver variants, and compares
acoustic contrast (rank 1 and rank V) on the post-warmup tail — the
same 0.25 dB gate tools/quality_gate.py applies to production kernels.

Usage: tracking_gate.py [num_hops]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from apvast_tpu.config import GevdSolver, production_overrides  # noqa: E402
from apvast_tpu.engine import build_plan, init_state, run_stream  # noqa: E402
from apvast_tpu.utils.scenes import scale_scene  # noqa: E402


def tail_contrast(out, rir_a, rir_b, tail_hops, hop):
    """Acoustic contrast (dB) of one filter rank's tail output, computed
    on-device (fft convolution over (srcs, mics))."""
    sig = out[-tail_hops * hop :]  # (t, srcs)
    t, s = sig.shape
    rl = rir_a.shape[0]
    n = int(2 ** np.ceil(np.log2(t + rl)))
    sf = jnp.fft.rfft(sig.astype(jnp.float32), n=n, axis=0)  # (n, s)
    powers = []
    for rir in (rir_a, rir_b):
        rf = jnp.fft.rfft(jnp.asarray(rir, jnp.float32), n=n, axis=0)
        pf = jnp.einsum("fs,fsm->fm", sf, rf)
        p = jnp.fft.irfft(pf, n=n, axis=0)[: t + rl - 1]
        powers.append(jnp.sum(jnp.square(p)))
    return 10.0 * jnp.log10(powers[0] / (powers[1] + 1e-30))


def main():
    nh = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tail = max(4, nh - 6)
    rng = np.random.default_rng(42)

    cases = [
        ("exact-eigh", dict(gevd_solver=GevdSolver.EIGH)),
        ("trk blessed", {}),  # blessed production (r5: T32 + r2.5 + half-form)
        ("trk T32", dict(tracking_rebuild_period=32)),
        # Residual threshold from tools/resid_profile.py: stationary
        # band 0.6-1.4 (occasional 2.0), +20 dB step spikes to ~3.1.
        ("trk T32 r2.5", dict(
            tracking_rebuild_period=32, tracking_residual_rebuild=2.5)),
        # Steady-state the carried Ritz basis keeps the RR pencil near
        # diagonal, so one cyclic-Jacobi sweep may suffice between
        # rebuilds (the residual fallback covers drift) — the RR
        # small-eigh is ~119 us/hop of the 32-spk budget at 2 sweeps.
        ("trk s1", dict(jacobi_sweeps=1)),
    ]
    base = None
    for nm, extra in cases:
        rng = np.random.default_rng(42)  # same signals for every case
        ov = production_overrides("tpu")
        ov.update(extra)
        sc = scale_scene(32, **ov)
        cfg = sc.config
        plan = build_plan(cfg, sc.rir_a, sc.rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        sa = jnp.asarray(rng.standard_normal(cfg.hop * nh), jnp.float32)
        sb = jnp.asarray(rng.standard_normal(cfg.hop * nh), jnp.float32)

        def run(st, a, b):
            st, outs = run_stream(cfg, plan, st, a, b)
            # outs.out_a: (hops, v, hop, srcs) -> stitch rank 0 and V-1
            o = outs.out_a
            r1 = o[:, 0].reshape(-1, cfg.num_srcs)
            rv = o[:, -1].reshape(-1, cfg.num_srcs)
            c1 = tail_contrast(r1, sc.rir_a, sc.rir_b, tail, cfg.hop)
            cv = tail_contrast(rv, sc.rir_a, sc.rir_b, tail, cfg.hop)
            return c1, cv, outs.silenced.sum()

        rj = jax.jit(run)
        t0 = time.time()
        c1, cv, sil = map(float, rj(state, sa, sb))
        dt = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(rj(state, sa, sb))
            best = min(best, time.time() - t0)
        nm = f"{nm} {best / nh * 1000:6.3f}ms/hop"
        if base is None:
            base = (c1, cv)
            print(
                f"{nm:14s} c1={c1:7.3f}  cV={cv:7.3f}  sil={int(sil)} "
                f"({dt:.0f}s)",
                flush=True,
            )
        else:
            print(
                f"{nm:14s} c1={c1:7.3f} ({c1-base[0]:+.3f})  "
                f"cV={cv:7.3f} ({cv-base[1]:+.3f})  sil={int(sil)} "
                f"({dt:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
