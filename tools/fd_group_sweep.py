#!/usr/bin/env python
"""FD group-coupled solve quality sweep (VERDICT r4 #6).

Round 3/4 established that the FD engine's binding quality constraint
is the J-tap truncation projection's spectral leakage, and that
fd_bin_coupling's block-diagonal smoothing (C=7, B=2) buys +2-3 dB to
17.4/18.7 dB. This sweeps the round-5 group-coupled solve
(fd_group_size: joint design over G adjacent bins with every
within-group coupling block kept) over group size x coupling window x
overlap, next to the pinned baselines, on the bundled scene.

Usage: fd_group_sweep.py [--hops N] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hops", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", default="main")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.engine import build_plan
    from apvast_tpu.engine.fd_hop import init_fd_state, process_hop_fd
    from apvast_tpu.evaluation import (
        acoustic_contrast_db,
        normalized_mse,
        predict_pressure,
    )
    from apvast_tpu.utils import load_reference_rirs

    rir_a, rir_b = load_reference_rirs()
    base = ApVastConfig.for_rirs(
        rir_a, rir_b,
        block_size=1600, filter_length=100, modeling_delay=20,
        reference_index_a=7, reference_index_b=7,
        num_eigenvectors=16, fd_frame_taps=2, fd_span="full",
        mu=1.0, statistics_buffer_length=201, sampling_rate=48000,
        perceptual=True, dtype="float32",
    )

    rng0 = np.random.default_rng(4)
    sig_a = rng0.standard_normal(base.hop * args.hops).astype(np.float32)
    sig_b = rng0.standard_normal(base.hop * args.hops).astype(np.float32)

    # (label, overrides) — baselines first. All points are full-span
    # B=2 (the low-cost production family); the rank-8 'all' pinned
    # point is in fd_sweep.py / tests for comparison (17.4/18.7 dB).
    if args.grid == "main":
        # A plain group solve is singular to working precision (the
        # J-tap projection makes adjacent bins nearly collinear:
        # measured NMSE 1e2-1e5, contrast ~0); every group point uses
        # the truncated-pseudo-inverse solve (fd_group_rank_tol).
        grid = [
            ("C7 G1 (pinned)", dict(fd_bin_coupling=7)),
            ("C17G8 t1e-2", dict(fd_bin_coupling=17, fd_group_size=8,
                                 fd_group_rank_tol=1e-2)),
            ("C17G8 t1e-3", dict(fd_bin_coupling=17, fd_group_size=8,
                                 fd_group_rank_tol=1e-3)),
            ("C17G8 t1e-4", dict(fd_bin_coupling=17, fd_group_size=8,
                                 fd_group_rank_tol=1e-4)),
            ("C17G8 t3 ovl", dict(fd_bin_coupling=17, fd_group_size=8,
                                  fd_group_rank_tol=1e-3,
                                  fd_group_overlap=True)),
            ("C33G16 t1e-3", dict(fd_bin_coupling=33, fd_group_size=16,
                                  fd_group_rank_tol=1e-3)),
            ("C33G16 t1e-4", dict(fd_bin_coupling=33, fd_group_size=16,
                                  fd_group_rank_tol=1e-4)),
        ]
    elif args.grid == "iter":
        # Exact-coupling iterative refinement (fd_coupled_iters, PCG).
        grid = [
            ("C7 G1 (pinned)", dict(fd_bin_coupling=7)),
            ("cg2", dict(fd_bin_coupling=7, fd_coupled_iters=2)),
            ("cg4", dict(fd_bin_coupling=7, fd_coupled_iters=4)),
            ("cg8", dict(fd_bin_coupling=7, fd_coupled_iters=8)),
            ("cg16", dict(fd_bin_coupling=7, fd_coupled_iters=16)),
            ("cg32", dict(fd_bin_coupling=7, fd_coupled_iters=32)),
            ("cg64", dict(fd_bin_coupling=7, fd_coupled_iters=64)),
        ]
    else:  # refine
        grid = [
            ("C33G16t4 ovl", dict(fd_bin_coupling=33, fd_group_size=16,
                                  fd_group_rank_tol=1e-4,
                                  fd_group_overlap=True)),
            ("C17G8 t1e-5", dict(fd_bin_coupling=17, fd_group_size=8,
                                 fd_group_rank_tol=1e-5)),
            ("C33G16 t1e-5", dict(fd_bin_coupling=33, fd_group_size=16,
                                  fd_group_rank_tol=1e-5)),
            ("C9 G4 t1e-3", dict(fd_bin_coupling=9, fd_group_size=4,
                                 fd_group_rank_tol=1e-3)),
        ]

    print(f"{'config':>14} {'contrA':>7} {'contrB':>7} "
          f"{'nmseA':>7} {'nmseB':>7} {'s/hop':>7}", flush=True)
    import dataclasses

    for label, over in grid:
        cfg = dataclasses.replace(base, **over)
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_fd_state(cfg, key=jax.random.key(0))
        fn = jax.jit(
            lambda s, a, b, _c=cfg, _p=plan:
            process_hop_fd(_c, _p, s, a, b, forgetting=0.97)
        )
        outs = []
        t0 = time.time()
        for h in range(args.hops):
            state, out = fn(
                state,
                jnp.asarray(sig_a[h * cfg.hop:(h + 1) * cfg.hop]),
                jnp.asarray(sig_b[h * cfg.hop:(h + 1) * cfg.hop]),
            )
            outs.append(
                (np.asarray(out.out_a[-1]), np.asarray(out.out_b[-1]),
                 np.asarray(out.out_a_t), np.asarray(out.out_b_t))
            )
        dt = (time.time() - t0) / args.hops
        warm = args.hops // 2
        fa = np.concatenate([o[0] for o in outs[warm:]], axis=0)
        fb = np.concatenate([o[1] for o in outs[warm:]], axis=0)
        ta = np.concatenate([o[2] for o in outs[warm:]], axis=0)
        tb = np.concatenate([o[3] for o in outs[warm:]], axis=0)
        p_aa = predict_pressure(jnp.asarray(fa), jnp.asarray(rir_a))
        p_ab = predict_pressure(jnp.asarray(fa), jnp.asarray(rir_b))
        p_bb = predict_pressure(jnp.asarray(fb), jnp.asarray(rir_b))
        p_ba = predict_pressure(jnp.asarray(fb), jnp.asarray(rir_a))
        pt_a = predict_pressure(jnp.asarray(ta), jnp.asarray(rir_a))
        pt_b = predict_pressure(jnp.asarray(tb), jnp.asarray(rir_b))
        ca = float(acoustic_contrast_db(p_aa, p_ab))
        cb = float(acoustic_contrast_db(p_bb, p_ba))
        na = float(normalized_mse(p_aa, pt_a))
        nb = float(normalized_mse(p_bb, pt_b))
        print(f"{label:>14} {ca:7.2f} {cb:7.2f} {na:7.3f} {nb:7.3f} "
              f"{dt:7.3f}", flush=True)


if __name__ == "__main__":
    main()
