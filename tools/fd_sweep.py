#!/usr/bin/env python
"""FD-engine quality sweep: forgetting x per-bin rank x loading on the
bundled scene (VERDICT round-1 weak #8) — maps the contrast/NMSE
frontier of the frequency-domain engine next to the time-domain
engine's operating point.

Usage: fd_sweep.py [--hops N] [--cpu] [--coupling]
Prints one table row per grid point. --coupling sweeps the round-3
leakage-aware axis (fd_bin_coupling x fd_frame_taps) at the round-2
frontier's forgetting/rank instead of the base grid.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hops", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--coupling", action="store_true")
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
        num_eigenvectors=8,  # overridden per grid point
        mu=1.0, statistics_buffer_length=201, sampling_rate=48000,
        perceptual=True, dtype="float32",
    )

    rng0 = np.random.default_rng(4)
    sig_a = rng0.standard_normal(base.hop * args.hops).astype(np.float32)
    sig_b = rng0.standard_normal(base.hop * args.hops).astype(np.float32)

    print(f"{'forget':>7} {'rank':>4} {'reg':>8} {'C':>3} {'B':>3} "
          f"{'contrA':>7} {'contrB':>7} {'nmseA':>7} {'nmseB':>7}",
          flush=True)
    import dataclasses

    if args.coupling:
        # Round-3 leakage axis at the round-2 frontier operating point.
        grid = [
            (0.97, 8, None, c, b)
            for c in (1, 3, 5, 7, 11, 17)
            for b in (1, 2)
        ]
    else:
        grid = [
            (forgetting, rank, reg, 1, 1)
            for forgetting in (0.7, 0.9, 0.97)
            for rank in (1, 4, 8)
            for reg in (None, 1e-3)
        ]
    results = []
    for forgetting, rank, reg, coupling, taps in grid:
                cfg = dataclasses.replace(
                    base,
                    num_eigenvectors=rank,
                    fd_bin_coupling=coupling,
                    fd_frame_taps=taps,
                )
                plan = build_plan(cfg, rir_a, rir_b)
                state = init_fd_state(cfg, key=jax.random.key(0))
                fn = jax.jit(
                    lambda s, a, b, _c=cfg, _p=plan, _f=forgetting, _r=reg:
                    process_hop_fd(_c, _p, s, a, b, forgetting=_f, reg=_r)
                )
                outs = []
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
                reg_s = "auto" if reg is None else f"{reg:.0e}"
                print(f"{forgetting:7.2f} {rank:4d} {reg_s:>8} "
                      f"{coupling:3d} {taps:3d} "
                      f"{ca:7.2f} {cb:7.2f} {na:7.3f} {nb:7.3f}", flush=True)
                results.append(
                    (forgetting, rank, reg, coupling, taps, ca, cb, na, nb)
                )
    return results


if __name__ == "__main__":
    main()
