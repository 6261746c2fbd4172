#!/usr/bin/env python
"""Headline benchmark: real-time factor of AP-VAST filter updates.

Scene = the measured CPU baseline configuration (BASELINE.md): the bundled
rirs.mat (800 taps x 8 loudspeakers x 9 mics), block 1600 / hop 800 @
48 kHz, filter length 100 (JL = 800), statistics buffer 1000, V = 50,
mu = 1 — the reference's `make_python_test.m` hyperparameters, measured at
~2.2 s/hop (132x slower than real time) on the 1-core CPU reference.

Runs the float32 production engine (subspace GEVD solver, validated
contrast-exact vs the reference solver). Prints ONE JSON line:
  {"metric": "rtf_filter_updates", "value": <x real time>,
   "unit": "x_realtime", "vs_baseline": <speedup over reference>}

Robustness: the TPU tunnel in this environment can wedge on unsupported
ops, so the measurement runs in a watchdogged child process; if the TPU
attempt fails or hangs, a CPU child provides the fallback number (the
"device" key records which one produced the result).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HOP_SECONDS = 800 / 48000.0
REFERENCE_RTF = 1.0 / 132.0  # BASELINE.md: 132x slower than real time


def measure(device: str) -> int:
    """Child mode: run the measurement and print the JSON line."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from apvast_tpu.config import ApVastConfig, GevdSolver
    from apvast_tpu.engine import build_plan, init_state, run_stream
    from apvast_tpu.utils import load_reference_rirs

    rir_a, rir_b = load_reference_rirs()
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=1600,
        filter_length=100,
        modeling_delay=20,
        reference_index_a=7,
        reference_index_b=7,
        num_eigenvectors=50,
        mu=1.0,
        statistics_buffer_length=1000,
        sampling_rate=48000,
        perceptual=False,  # matches the measured baseline configuration
        dtype="float32",
        # Performance mode: warm-started top-V subspace GEVD (validated
        # contrast-exact vs the reference solver at every rank on this
        # scene, tests/test_subspace_solver.py) + fused Pallas statistics.
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_oversample=6,
        subspace_iters=2,
        use_pallas_statistics=(device == "tpu"),
        use_pallas_output=(device == "tpu"),
        use_pallas_conv=(device == "tpu"),
        use_matmul_dft=(device == "tpu"),
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))

    rng = np.random.default_rng(0)
    # 128 hops per dispatch measures sustained streaming throughput (the
    # tunnel costs ~9 ms per dispatch regardless of stream length; the
    # baseline's 2.2 s/hop is likewise a steady-state number).
    num_hops = 16 if device == "cpu" else 128
    sig_a = jnp.asarray(rng.standard_normal(cfg.hop * num_hops), dtype=jnp.float32)
    sig_b = jnp.asarray(rng.standard_normal(cfg.hop * num_hops), dtype=jnp.float32)

    def run(state):
        state, outs = run_stream(cfg, plan, state, sig_a, sig_b)
        # Scalar checksum forces real completion (axon's block_until_ready
        # does not actually wait).
        return state, jnp.sum(jnp.abs(outs.out_a).astype(jnp.float32))

    state1, chk = run(state)  # warmup/compile
    if not np.isfinite(float(chk)):
        print(json.dumps({"error": "non-finite outputs"}))
        return 1

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        _, chk = run(state1)
    float(chk)
    per_hop = (time.time() - t0) / (reps * num_hops)

    rtf = HOP_SECONDS / per_hop
    print(
        json.dumps(
            {
                "metric": "rtf_filter_updates",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / REFERENCE_RTF, 1),
                "device": device,
            }
        )
    )
    return 0


def _try_child(device: str, timeout: float) -> dict | None:
    env = dict(os.environ)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", device],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            data = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if "metric" in data:
            return data
    return None


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        return measure(sys.argv[2])

    result = _try_child("tpu", timeout=480)
    if result is None:
        result = _try_child("cpu", timeout=900)
    if result is None:
        result = {
            "metric": "rtf_filter_updates",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": "both TPU and CPU measurement children failed",
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
