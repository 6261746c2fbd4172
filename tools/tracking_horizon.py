#!/usr/bin/env python
"""Long-horizon nonstationarity gate for the tracking GEVD solver
(VERDICT r4 #4).

The blessed tracking point (rebuild every 16 hops) was gated on short
stationary white-noise runs; nothing exercised 1000+ hops of program-
like material where a stale carried preconditioner is most likely to
drift — the failure mode is a graceful contrast fade, which the
``silenced`` NaN counter cannot see. This tool runs >= 1000 hops of
AR-colored noise with level steps (+/-20 dB), silence gaps, and
spectral shifts through the REAL engine and compares SEGMENT-WISE
acoustic contrast (rank 1 and rank V) of the tracking solver against
the exact dense-eigh solver — the same 0.25 dB envelope as
tools/tracking_gate.py, but enforced per segment across the horizon.

Usage: tracking_horizon.py [nsrc] [num_hops] [seg_hops] [--cpu]
       [--resid T]   # also run tracking with residual-triggered
                     # rebuild threshold T (config.tracking_residual_rebuild)

Reference contract: per-hop adaptivity is the point of AP-VAST
(/root/reference/Python/apvast.py:153-165 redesigns the filters every
hop from fresh statistics).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def program_signal(rng, num_hops, hop, seg_hops):
    """Program-like test signal: per-segment AR(1)-colored noise with a
    level profile containing 20 dB steps and true silence gaps, plus a
    spectral shift (AR pole moves) every few segments. Returns
    (signal, seg_levels) with signal of length num_hops * hop."""
    segs = []
    levels = []
    nseg = num_hops // seg_hops
    poles = [0.0, 0.9, -0.6, 0.97]
    for i in range(nseg):
        n = seg_hops * hop
        # Level schedule: loud / nominal / quiet / SILENT, repeating
        # with a different phase than the spectral schedule.
        level = [3.16, 1.0, 0.1, 0.0][i % 4] if nseg >= 4 else 1.0
        w = rng.standard_normal(n + 256)
        a = poles[(i // 2) % len(poles)]
        if a != 0.0:
            k = a ** np.arange(256)
            w = np.convolve(w, k)[: n + 256]
        x = level * w[256 : 256 + n] / max(np.std(w[256:]), 1e-12)
        segs.append(x)
        levels.append(level)
    return np.concatenate(segs).astype(np.float32), levels


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cpu = "--cpu" in sys.argv
    resid_t = None
    if "--resid" in sys.argv:
        resid_t = float(sys.argv[sys.argv.index("--resid") + 1])
        args = [a for a in args if a != str(resid_t)]
    sweeps = None
    if "--sweeps" in sys.argv:
        sweeps = int(sys.argv[sys.argv.index("--sweeps") + 1])
        args = [a for a in args if a != str(sweeps)]
    nsrc = int(args[0]) if len(args) > 0 else 16
    num_hops = int(args[1]) if len(args) > 1 else 1024
    seg_hops = int(args[2]) if len(args) > 2 else 64

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from apvast_tpu.config import GevdSolver, production_overrides
    from apvast_tpu.engine import build_plan, init_state, run_stream
    from apvast_tpu.utils.scenes import scale_scene

    rng = np.random.default_rng(7)
    device = "cpu" if cpu else "tpu"
    sig_a, levels = program_signal(rng, num_hops, 800, seg_hops)
    sig_b, _ = program_signal(rng, num_hops, 800, seg_hops)

    trk = {} if sweeps is None else dict(jacobi_sweeps=sweeps)
    cases = [("exact-eigh", dict(gevd_solver=GevdSolver.EIGH))]
    cases.append(("tracking (blessed)", dict(trk)))
    if resid_t is not None:
        cases.append(
            (f"tracking resid>{resid_t}",
             dict(trk, tracking_residual_rebuild=resid_t)),
        )

    results = {}
    for nm, extra in cases:
        ov = production_overrides(device)
        ov.update(extra)
        sc = scale_scene(nsrc, **ov)
        cfg = sc.config
        plan = build_plan(cfg, sc.rir_a, sc.rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        hop = cfg.hop
        sa = jnp.asarray(sig_a[: num_hops * hop])
        sb = jnp.asarray(sig_b[: num_hops * hop])

        def run_seg(st, a, b):
            st, outs = run_stream(cfg, plan, st, a, b)
            o = outs.out_a  # (hops, v, hop, srcs)
            r1 = o[:, 0].reshape(-1, cfg.num_srcs)
            rv = o[:, -1].reshape(-1, cfg.num_srcs)

            def contrast(sig):
                t = sig.shape[0]
                rl = sc.rir_a.shape[0]
                n = int(2 ** np.ceil(np.log2(t + rl)))
                sf = jnp.fft.rfft(sig.astype(jnp.float32), n=n, axis=0)
                ps = []
                for rir in (sc.rir_a, sc.rir_b):
                    rf = jnp.fft.rfft(
                        jnp.asarray(rir, jnp.float32), n=n, axis=0
                    )
                    p = jnp.fft.irfft(
                        jnp.einsum("fs,fsm->fm", sf, rf), n=n, axis=0
                    )[: t + rl - 1]
                    ps.append(jnp.sum(jnp.square(p)))
                return ps[0], ps[1]

            pa1, pb1 = contrast(r1)
            pav, pbv = contrast(rv)
            return st, (pa1, pb1, pav, pbv, jnp.sum(outs.silenced))

        runj = jax.jit(run_seg)
        rows = []
        silenced = 0
        import time

        t0 = time.time()
        for i in range(num_hops // seg_hops):
            s0 = i * seg_hops * hop
            st_ = sa[s0 : s0 + seg_hops * hop]
            sb_ = sb[s0 : s0 + seg_hops * hop]
            state, (pa1, pb1, pav, pbv, sil) = runj(state, st_, sb_)
            silenced += int(sil)
            pa1, pb1, pav, pbv = map(float, (pa1, pb1, pav, pbv))
            c1 = 10 * np.log10(pa1 / (pb1 + 1e-30)) if pa1 > 1e-20 else None
            cv = 10 * np.log10(pav / (pbv + 1e-30)) if pav > 1e-20 else None
            rows.append((c1, cv, pa1))
        results[nm] = (rows, silenced)
        print(
            f"{nm}: {num_hops} hops in {time.time()-t0:.0f}s, "
            f"silenced={silenced}",
            flush=True,
        )

    ref_rows, _ = results[cases[0][0]]
    print(f"\n{'seg':>4} {'lvl':>5} " + " ".join(
        f"{nm[:18]:>20}" for nm, _ in cases
    ) + "   (c1 / cV dB)")
    worst = {nm: 0.0 for nm, _ in cases[1:]}
    for i in range(len(ref_rows)):
        line = f"{i:4d} {levels[i]:5.2f} "
        for nm, _ in cases:
            c1, cv, pa = results[nm][0][i]
            if c1 is None:
                line += f"{'silent':>20}"
            else:
                line += f"{c1:9.2f} /{cv:8.2f} "
            if nm != cases[0][0] and c1 is not None and ref_rows[i][0]:
                d1 = abs(c1 - ref_rows[i][0])
                dv = abs(cv - ref_rows[i][1])
                worst[nm] = max(worst[nm], d1, dv)
        print(line, flush=True)
    for nm, w in worst.items():
        gate = "PASS" if w <= 0.25 else "FAIL"
        print(f"{nm}: worst per-segment |delta| {w:.3f} dB -> {gate}")


if __name__ == "__main__":
    main()
