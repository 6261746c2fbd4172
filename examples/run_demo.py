#!/usr/bin/env python
"""End-to-end demo: the Matlab/main.m experiment as a framework script.

Loads the bundled scene (or a synthetic one), streams two program signals
through the AP-VAST engine in MATLAB multi-solution mode
(spans [1, JL/2, JL] — BACC / mid-span / pressure matching,
Matlab/main.m:38), predicts zone pressures on validation RIRs, and prints
contrast / NMSE / detectability per span (metric definitions
Matlab/main.m:120-130).

Usage:  python examples/run_demo.py [--cpu] [--hops N] [--perceptual]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Allow running straight from a checkout.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU")
    parser.add_argument("--hops", type=int, default=20)  # main.m:47
    parser.add_argument("--perceptual", action="store_true")
    parser.add_argument("--x64", action="store_true", help="float64 parity mode")
    parser.add_argument("--fd", action="store_true", help="frequency-domain engine")
    parser.add_argument(
        "--fast",
        action="store_true",
        help="production stack: subspace GEVD + Pallas kernels + matmul-DFT "
        "(float32, TPU)",
    )
    parser.add_argument("--wav-a", help="program A wav file (default: noise)")
    parser.add_argument("--wav-b", help="program B wav file (default: noise)")
    parser.add_argument(
        "--plot",
        metavar="OUT.png",
        help="save the main.m:78-118 four-panel pressure figure "
        "(target vs reproduced, mic 0, all spans)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from apvast_tpu import ApVast
    from apvast_tpu.evaluation import (
        acoustic_contrast_db,
        detectability,
        normalized_mse,
        predict_pressure,
    )
    from apvast_tpu.perceptual import build_perceptual_tables
    from apvast_tpu.utils import load_reference_rirs

    # Control RIRs = the bundled scene. The reference's separate
    # validation mic set lives in the stripped Matlab/rirs.mat blob
    # (main.m:35), so build a HELD-OUT validation set from the measured
    # data itself: virtual microphones halfway between adjacent control
    # mics (pairwise-averaged RIRs — the two-path sum a mic between the
    # pair would approximately measure). Unlike a perturbed copy of the
    # control set, these positions never enter the filter design.
    rir_a, rir_b = load_reference_rirs()
    val_a = 0.5 * (rir_a[:, :, :-1] + rir_a[:, :, 1:])
    val_b = 0.5 * (rir_b[:, :, :-1] + rir_b[:, :, 1:])

    filter_length, srcs = 100, rir_a.shape[1]
    common = dict(
        block_size=1600,
        rir_a=rir_a,
        rir_b=rir_b,
        filter_length=filter_length,
        modeling_delay=20,
        reference_index_a=7,
        reference_index_b=7,
        mu=1.0,
        sampling_rate=48000,
        perceptual=args.perceptual,
        key=jax.random.key(0),
        dtype="float64" if args.x64 else "float32",
    )
    if args.fast:
        from apvast_tpu.config import GevdSolver

        common.update(
            gevd_solver=GevdSolver.SUBSPACE,
            subspace_oversample=6,
            subspace_iters=2,
            use_pallas_statistics=True,
            use_pallas_output=True,
            use_pallas_conv=True,
            use_matmul_dft=True,
        )
    if args.fd:
        from apvast_tpu import ApVastFD

        # FD spans are per-bin ranks 1..num_srcs.
        spans = (1, srcs // 2, srcs)
        model = ApVastFD(number_of_eigenvectors=srcs, **common)
        span_index = {sp: sp - 1 for sp in spans}
    else:
        # The reference demo uses spans [1, JL/2, JL] (main.m:38); V = 200
        # keeps the eigendecomposition affordable while spanning BACC ->
        # mid-span -> near-pressure-matching.
        spans = (1, 50, 200)
        model = ApVast(
            number_of_eigenvectors=max(spans),
            statistics_buffer_length=1000,
            output_spans=spans,
            **common,
        )
        span_index = {sp: i for i, sp in enumerate(spans)}

    rng = np.random.default_rng(7)
    hop = model.config.hop

    def program(path):
        if path:
            from apvast_tpu.utils.io import load_wav

            sig, _ = load_wav(path, target_rate=48000)
            return sig[: hop * args.hops]
        return rng.standard_normal(hop * args.hops)

    sig_a = program(args.wav_a)
    sig_b = program(args.wav_b)

    t0 = time.time()
    out_a, out_b, out_a_t, out_b_t = model.process_signals(sig_a, sig_b)
    elapsed = time.time() - t0
    print(
        f"streamed {args.hops} hops ({args.hops * hop / 48000:.2f} s audio) "
        f"in {elapsed:.2f} s wall"
    )

    tail = slice(hop * 6, None)  # drop warmup
    target_pressure_a = predict_pressure(np.asarray(out_a_t[0])[tail], val_a)
    target_pressure_b = predict_pressure(np.asarray(out_b_t[0])[tail], val_b)
    tables = build_perceptual_tables(1600, 48000.0, 94.0)

    print(f"\n{'span':>6} {'contrA dB':>10} {'contrB dB':>10} "
          f"{'nmseA':>8} {'nmseB':>8} {'detect(leak A->B)':>18}")
    pressures = {}  # span -> (p_aa, p_ab, p_bb, p_ba), kept for --plot
    for span in spans:
        i = span_index[span]
        fa = np.asarray(out_a[i])[tail]
        fb = np.asarray(out_b[i])[tail]
        p_aa, p_ab = predict_pressure(fa, val_a), predict_pressure(fa, val_b)
        p_bb, p_ba = predict_pressure(fb, val_b), predict_pressure(fb, val_a)
        pressures[span] = tuple(np.asarray(p) for p in (p_aa, p_ab, p_bb, p_ba))
        ca = float(acoustic_contrast_db(p_aa, p_ab))
        cb = float(acoustic_contrast_db(p_bb, p_ba))
        na = float(normalized_mse(p_aa, target_pressure_a))
        nb = float(normalized_mse(p_bb, target_pressure_b))
        # Detectability of program-A leakage in zone B, masked by zone B's
        # own target pressure (block 0, mic 0).
        leak = np.asarray(p_ab)[:1600, 0]
        masker = np.asarray(p_bb)[:1600, 0]
        d = float(np.mean(np.asarray(detectability(leak[None], masker[None], tables))))
        print(f"{span:>6} {ca:>10.1f} {cb:>10.1f} {na:>8.3f} {nb:>8.3f} {d:>18.2e}")

    if args.plot:
        save_pressure_figure(
            args.plot,
            spans,
            np.asarray(target_pressure_a),
            np.asarray(target_pressure_b),
            pressures,
        )
        print(f"wrote {args.plot}")
    return 0


def save_pressure_figure(path, spans, target_a, target_b, pressures):
    """The Matlab/main.m:78-118 figure: four panels of target vs
    reproduced pressure at validation mic 0, one trace per span
    (legend 'target', 'V = 1', 'V = JL/2', 'V = JL' in main.m).

    Panels: A-to-A and B-to-B (reproduction in the bright zone),
    B-to-A and A-to-B (leakage into the dark zone, compared against
    that zone's target to show suppression scale)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    n = min(2000, target_a.shape[0])
    t = np.arange(n) / 48.0  # ms
    # main.m:78 pins lim = [-1, 1]*.5 for its scaled program material;
    # the bundled-scene pressures are ~1e-3, so share one data-driven
    # limit across all four panels instead (same intent: common scale).
    lim = 1.15 * max(
        np.abs(target_a[:n, 0]).max(),
        np.abs(target_b[:n, 0]).max(),
        max(np.abs(p[:n, 0]).max() for ps in pressures.values() for p in ps),
    )
    # Fixed-order categorical slots 1-3 (validated reference palette);
    # the target trace is neutral ink, not a series hue.
    series = ["#2a78d6", "#eb6834", "#1baf7a"]
    target_ink = "#555555"

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), sharex=True, sharey=True)
    panels = [
        ("A to A", target_a, [pressures[s][0] for s in spans]),
        ("B to B", target_b, [pressures[s][2] for s in spans]),
        ("B to A (leakage)", target_a, [pressures[s][3] for s in spans]),
        ("A to B (leakage)", target_b, [pressures[s][1] for s in spans]),
    ]
    for ax, (title, target, traces) in zip(axes.ravel(), panels):
        ax.plot(t, target[:n, 0], color=target_ink, lw=1.6, ls="--",
                label="target", zorder=1)
        for c, span, p in zip(series, spans, traces):
            ax.plot(t, p[:n, 0], color=c, lw=1.0, label=f"V = {span}",
                    zorder=2)
        ax.set_title(title, fontsize=11)
        ax.set_ylim(-lim, lim)
        ax.grid(True, color="#e3e2d9", lw=0.6)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
    axes[0, 0].legend(loc="upper right", fontsize=9, frameon=False)
    for ax in axes[1]:
        ax.set_xlabel("time (ms)")
    for ax in axes[:, 0]:
        ax.set_ylabel("pressure")
    fig.suptitle("AP-VAST reproduced vs target pressure (validation mic 0)")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)


if __name__ == "__main__":
    sys.exit(main())
