#!/usr/bin/env python
"""Stage-level TPU profile of the north-star scene (16 spk, perceptual ON).

Times each hop stage separately (jitted in isolation) plus the full hop
and a sustained stream, with forced-sync scalar fetches (axon's
block_until_ready is a no-op). Run under a watchdog; prints one line per
measurement as it lands so partial output survives a wedge.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from apvast_tpu.config import ApVastConfig, GevdSolver, production_overrides
from apvast_tpu.engine import build_plan, init_state, run_stream
from apvast_tpu.engine.hop import (
    convolve_inputs,
    process_hop,
    weighted_spectra,
    _synthesize,
)
from apvast_tpu.ops.wola import slide, wola_overlap_add_tail
from apvast_tpu.ops.jdiag import jdiag_topk_batched
from apvast_tpu.utils.scenes import scale_scene

SYNC_OVERHEAD_NOTE = "each number includes ~3ms fixed sync overhead"


def timeit(name, fn, *args, reps=30):
    out = fn(*args)  # compile
    tot = jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
        out,
        jnp.float32(0),
    )
    float(tot)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    tot = jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
        out,
        jnp.float32(0),
    )
    float(tot)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:45s} {dt:8.3f} ms", flush=True)
    return out


def main():
    nsrc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = scale_scene(
        nsrc,
        **production_overrides(),
    )
    cfg = scene.config
    print(
        f"scene: srcs={cfg.num_srcs} mics={cfg.num_mics} J={cfg.filter_length}"
        f" JL={cfg.num_srcs*cfg.filter_length} block={cfg.block_size}"
        f" perceptual={cfg.perceptual}",
        flush=True,
    )
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    rng = np.random.default_rng(0)
    hop_a = jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32)
    hop_b = jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32)
    hops = jnp.stack([hop_a, hop_b])

    # warm the full hop first so state fields are realistic
    full = jax.jit(lambda p, s, a, b: process_hop(cfg, p, s, a, b))
    state1, _ = full(plan, state, hop_a, hop_b)

    print(f"--- stages ({SYNC_OVERHEAD_NOTE}) ---", flush=True)

    # stage 1: conv
    conv = jax.jit(
        lambda p, s, h: convolve_inputs(cfg, p, s.conv_history, s.resp, s.target_resp, h)
    )
    timeit("1 convolve_inputs (pallas windows-matmul)", conv, plan, state1, hops)

    # stages 2+3: weighting + synth + OLA
    import numpy as _np0
    _r0 = _np0.random.default_rng(3)
    fresh_r = jnp.asarray(
        1e-3 * _r0.standard_normal(s_like := (4, cfg.num_mics, cfg.num_srcs, cfg.hop)),
        jnp.float32,
    )
    fresh_t = jnp.asarray(
        1e-3 * _r0.standard_normal((2, cfg.num_mics, cfg.hop)), jnp.float32
    )

    def stage23(p, s):
        wt_spec, r_spec, _ = weighted_spectra(
            cfg, p, (s.resp, fresh_r), (s.target_resp, fresh_t)
        )
        new_wt = _synthesize(cfg, p, wt_spec, cfg.block_size)
        o1, e1 = wola_overlap_add_tail(s.wtarget_overlap, new_wt, cfg.hop)
        st1 = slide(s.wtarget_stat, e1)
        new_wr = _synthesize(cfg, p, r_spec, cfg.block_size)
        o2, e2 = wola_overlap_add_tail(s.wresp_overlap, new_wr, cfg.hop)
        st2 = slide(s.wresp_stat, e2)
        return o1, st1, o2, st2

    timeit("2+3 weighting/WOLA/slides", jax.jit(stage23), plan, state1)

    # stage 2+3 with the truncated-kernel weighting convolution
    import dataclasses as _dc0

    for taps in (257,):
        cfg_t = _dc0.replace(cfg, weighting_conv_taps=taps)

        def stage23_conv(p, s, c=cfg_t):
            from apvast_tpu.engine.hop import (
                _PATH_ZONE,
                _signal_gate,
                target_weighting,
            )
            from apvast_tpu.ops.weighting_conv import (
                circular_weighting_conv,
                weighting_kernel,
            )

            t_spec, weighting = target_weighting(
                c, p, (s.target_resp, fresh_t)
            )
            new_wt = _synthesize(c, p, t_spec * weighting, c.block_size)
            o1, e1 = wola_overlap_add_tail(s.wtarget_overlap, new_wt, c.hop)
            st1 = slide(s.wtarget_stat, e1)
            kern = weighting_kernel(
                weighting, c.block_size, taps, p.idft_cos
            )
            full = jnp.concatenate([s.resp, fresh_r], axis=-1)
            y = circular_weighting_conv(p.window * full, kern, taps)
            new_wr = p.window * (
                y * _signal_gate(c, jnp.float32)[:, None, None, None]
            )
            o2, e2 = wola_overlap_add_tail(s.wresp_overlap, new_wr, c.hop)
            st2 = slide(s.wresp_stat, e2)
            return o1, st1, o2, st2

        try:
            timeit(
                f"2+3 weighting conv T={taps}", jax.jit(stage23_conv), plan, state1
            )
        except Exception as exc:
            print(f"2+3 weighting conv T={taps} FAILED: {str(exc)[:140]}",
                  flush=True)

    # stage 4: pallas statistics
    from apvast_tpu.ops.pallas.statistics import covariance_pallas

    j = cfg.filter_length

    def stage4(s):
        buf = s.wresp_stat  # deleted form already (engine/state.py)
        k = buf.shape[-1] - j + 1
        d = s.wtarget_stat[..., -k:]
        return covariance_pallas(buf, d, j)

    r_mats, r_cross = timeit("4 covariance (pallas fused)", jax.jit(stage4), state1)

    # stage 4 alternatives: lag-correlation statistics
    from apvast_tpu.ops.lag_statistics import covariance_via_lags

    def stage4_lag(s, meth):
        buf = s.wresp_stat  # deleted form already (engine/state.py)
        k = buf.shape[-1] - j + 1
        d = s.wtarget_stat[..., -k:]
        return covariance_via_lags(buf, d, j, c0_method=meth)

    for meth in ("conv", "matmul"):
        try:
            timeit(
                f"4 covariance (lag {meth})",
                jax.jit(lambda s, m=meth: stage4_lag(s, m)),
                state1,
            )
        except Exception as exc:
            print(f"4 covariance (lag {meth}) FAILED: {str(exc)[:140]}",
                  flush=True)

    # full hop with lag statistics (plan is implementation-independent)
    import dataclasses as _dc

    cfg_lag = _dc.replace(
        cfg, use_lag_statistics=True, use_pallas_statistics=False
    )
    try:
        full_lag = jax.jit(
            lambda p, s, a, b: process_hop(cfg_lag, p, s, a, b)
        )
        timeit("full hop (lag statistics)", full_lag, plan, state1, hop_a, hop_b)
    except Exception as exc:
        print(f"full hop (lag statistics) FAILED: {str(exc)[:140]}", flush=True)

    # candidate production hop: lag statistics + truncated weighting
    cfg_prod3 = _dc.replace(cfg_lag, weighting_conv_taps=257)
    try:
        full_p3 = jax.jit(
            lambda p, s, a, b: process_hop(cfg_prod3, p, s, a, b)
        )
        timeit("full hop (lag + weighting conv)", full_p3, plan, state1,
               hop_a, hop_b)
    except Exception as exc:
        print(f"full hop (lag + conv) FAILED: {str(exc)[:140]}", flush=True)

    # stage 5: solver
    eye = jnp.eye(cfg.num_srcs * j, dtype=jnp.float32)
    a_stack = r_mats[jnp.asarray([0, 3])]
    b_stack = r_mats[jnp.asarray([1, 2])]
    if cfg.effective_reg_b_relative > 0:
        md = jnp.einsum("zii->z", b_stack) / (cfg.num_srcs * j)
        b_stack = b_stack + (cfg.effective_reg_b_relative * md)[:, None, None] * eye

    def stage5(a, b, q):
        return jdiag_topk_batched(
            a, b, cfg.reg_b, cfg.num_eigenvectors, cfg.subspace_iters,
            q, cfg.subspace_orth, cfg.subspace_whiten,
            cfg.small_eigh, cfg.jacobi_sweeps,
            fused_iteration=cfg.use_pallas_subspace,
        )

    timeit("5 GEVD subspace solver", jax.jit(stage5), a_stack, b_stack, state1.gevd_q)

    # full hop
    timeit("full hop (1-hop dispatch)", full, plan, state1, hop_a, hop_b)

    # sustained stream
    for nh in (32, 128):
        sig_a = jnp.asarray(
            rng.standard_normal(cfg.hop * nh), dtype=jnp.float32
        )
        sig_b = jnp.asarray(
            rng.standard_normal(cfg.hop * nh), dtype=jnp.float32
        )

        def run(st):
            st, outs = run_stream(cfg, plan, st, sig_a, sig_b)
            return jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

        runj = jax.jit(run)
        float(runj(state1))  # compile
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            chk = runj(state1)
        float(chk)
        per_hop = (time.time() - t0) / (reps * nh) * 1000
        rtf = (800 / 48.0) / per_hop
        print(
            f"sustained {nh}-hop stream: {per_hop:.3f} ms/hop  RTF {rtf:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
