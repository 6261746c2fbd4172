#!/usr/bin/env python
"""FD-engine sustained speed at the pinned coupled operating point.

Measures ApVastFD (bundled scene, perceptual ON, rank 8, forgetting
0.97) with and without the round-3 leakage coupling (fd_bin_coupling=7,
fd_frame_taps=2) — the coupling adds 2C-1 weighted adds over the
(4, bins, SB, SB) covariance stack per hop, and this quantifies that
cost next to the round-1 measured 3.2 ms/hop independent-design figure.

Usage: fd_bench.py [--hops N] [--reps R] [--cpu]
Prints one line per configuration (partial output survives a wedge).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hops", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--eigh", default="lapack", choices=["lapack", "jacobi"])
    ap.add_argument(
        "--no-prod", action="store_true",
        help="disable the production data-path knobs (matmul-DFT + "
        "Pallas conv) that replace the FFT custom calls on TPU",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from apvast_tpu import ApVastFD
    from apvast_tpu.utils import load_reference_rirs

    rir_a, rir_b = load_reference_rirs()
    print(f"device: {jax.devices()[0].platform}  NH={args.hops}", flush=True)
    rng = np.random.default_rng(0)
    prod = {} if args.no_prod or args.cpu else dict(
        use_matmul_dft=True, use_pallas_conv=True
    )

    for label, kw in (
        ("independent", {}),
        ("coupled C=7 B=2", dict(fd_bin_coupling=7, fd_frame_taps=2)),
        # fd_span='full': the low-cost telescoped solve — no eigh. The
        # rank must equal num_srcs * fd_frame_taps (8 resp. 16 here).
        ("full-span ind", dict(fd_span="full")),
        ("full-span C=7 B=2",
         dict(fd_span="full", fd_bin_coupling=7, fd_frame_taps=2,
              number_of_eigenvectors=16)),
    ):
        m = ApVastFD(
            block_size=1600, rir_a=rir_a, rir_b=rir_b, filter_length=100,
            modeling_delay=20, reference_index_a=7, reference_index_b=7,
            number_of_eigenvectors=kw.pop("number_of_eigenvectors", 8),
            mu=1.0, dtype="float32",
            sampling_rate=48000, perceptual=True, key=jax.random.key(0),
            forgetting=0.97, fd_eigh=args.eigh, **prod, **kw,
        )
        sig_a = jnp.asarray(
            rng.standard_normal(m.config.hop * args.hops), jnp.float32
        )
        sig_b = jnp.asarray(
            rng.standard_normal(m.config.hop * args.hops), jnp.float32
        )

        # Plan/state/signals must be jit ARGUMENTS: closing over them
        # embeds the plan's complex spectra as MLIR constants, whose
        # host fetch the axon tunnel rejects (complex transfers are
        # UNIMPLEMENTED — the same reason build_plan computes them on
        # device).
        def run(plan, state, sa, sb):
            st, outs = m._stream_fn(plan, state, sa, sb)
            return jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

        runj = jax.jit(run)
        print(f"# COMPILE {label}", flush=True)
        t0 = time.time()
        chk = float(runj(m.plan, m.state, sig_a, sig_b))
        print(f"# COMPILED {time.time() - t0:.1f}s checksum finite: "
              f"{np.isfinite(chk)}", flush=True)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            float(runj(m.plan, m.state, sig_a, sig_b))
            best = min(best, time.time() - t0)
        ms = best / args.hops * 1000
        rtf = (m.config.hop / 48.0) / ms
        print(f"{label:18s} {ms:7.3f} ms/hop  RTF {rtf:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
