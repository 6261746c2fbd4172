#!/usr/bin/env python
"""Measure the statistics-stage implementations on the real device.

Compares, on the north-star (16-spk, SJ=800) and TPU-scale (32-spk,
SJ=1600) shapes:
  - pallas : the fused framing+covariance Pallas kernel (round-2 prod)
  - conv   : lag correlations via grouped lax.conv (ops/lag_statistics)
  - matmul : lag correlations via explicit shift stacks

Usage: lag_lab.py [reps]   (run on TPU; CPU works but proves nothing)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # Checksum forces completion through the axon tunnel.
    float(sum(jnp.sum(jnp.abs(o)) for o in out))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(sum(jnp.sum(jnp.abs(o)) for o in out))
        times.append(time.time() - t0)
    times.sort()
    return times[0] * 1e6, times[len(times) // 2] * 1e6  # us


def _bench_chained(fn, buf, d, iters=(8, 58), reps=3):
    """Device time per call, tunnel-proof: run `iters` dependent calls
    inside ONE fori_loop dispatch and difference the two iteration
    counts, cancelling the ~25-30 ms axon round-trip that floors
    per-dispatch timing. The data dependency (buf + 0*checksum, with the
    zero a runtime operand so XLA cannot fold it) serializes iterations
    without changing the values."""

    def run(b, t, zero, n):
        def body(_, carry):
            bb, acc = carry
            rm, rv = fn(bb, t)
            # Full reductions: a first-element probe lets XLA dead-code
            # the bulk of the computation out of the loop.
            s = jnp.sum(rm) + jnp.sum(rv)
            return (bb + zero * s, acc + s)

        return jax.lax.fori_loop(0, n, body, (b, jnp.float32(0.0)))[1]

    jr = jax.jit(run, static_argnums=3)
    zero = jnp.float32(0.0)
    walls = {}
    for n in iters:
        float(jr(buf, d, zero, n))  # compile + warm
        best = min(
            _timed(lambda: float(jr(buf, d, zero, n))) for _ in range(reps)
        )
        walls[n] = best
    per = (walls[iters[1]] - walls[iters[0]]) / (iters[1] - iters[0])
    return per * 1e6  # us/call


def _timed(thunk):
    t0 = time.time()
    thunk()
    return time.time() - t0


def main():
    chained = "--chained" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = int(argv[0]) if argv else 20
    from apvast_tpu.ops.lag_statistics import covariance_via_lags

    print(f"device: {jax.devices()[0].platform}", flush=True)
    for name, (s, j, m, n) in (
        ("north-star sj=800", (16, 50, 17, 999)),
        ("tpu-scale sj=1600", (32, 50, 33, 999)),
    ):
        rng = np.random.default_rng(1)
        buf = jnp.asarray(
            rng.standard_normal((4, m, s, n)), dtype=jnp.float32
        )
        k = n - j + 1
        d = jnp.asarray(
            rng.standard_normal((2, m, k)), dtype=jnp.float32
        )

        results = {}
        want = None
        methods = {
            meth: (
                lambda b, t, meth=meth: covariance_via_lags(
                    b, t, j, c0_method=meth
                )
            )
            for meth in ("conv", "matmul", "lag_pallas")
        }
        methods["lag_pallas"] = lambda b, t: covariance_via_lags(
            b, t, j, c0_method="pallas"
        )
        from apvast_tpu.ops.lag_statistics import covariance_via_lags_tap

        methods["tap_pallas"] = lambda b, t: covariance_via_lags_tap(
            b, t, j, c0_method="pallas"
        )
        from apvast_tpu.ops.lag_statistics import covariance_via_lags_wide

        methods["wide_pallas"] = lambda b, t: covariance_via_lags_wide(
            b, t, j, c0_method="pallas"
        )
        from apvast_tpu.ops.lag_statistics import covariance_via_lags_skew

        methods["skew_pallas"] = lambda b, t: covariance_via_lags_skew(
            b, t, j, c0_method="pallas"
        )
        from apvast_tpu.ops.pallas.statistics import covariance_pallas

        interp = jax.default_backend() == "cpu"
        methods["pallas"] = lambda b, t: covariance_pallas(
            b, t, j, interpret=interp
        )
        if s * j * j * s * 4 + s * j * k * 4 > 8 * 1024 * 1024:
            # Large-SJ shapes have two pallas variants; "pallas" above
            # follows the default (packed). Measure both explicitly.
            methods["panels"] = lambda b, t: covariance_pallas(
                b, t, j, interpret=interp, large_sj="panels"
            )
        if chained:
            del methods["matmul"]  # HBM shift stacks; never competitive
        for method, raw in methods.items():
            fn = jax.jit(raw)
            try:
                if chained:
                    per = _bench_chained(fn, buf, d)
                    results[method] = (per, per)
                else:
                    best, med = _bench(fn, buf, d, reps=reps)
                    results[method] = (best, med)
                got = fn(buf, d)
                if method != "pallas" and want is None:
                    want = got
                if method == "pallas" and want is not None:
                    rel = float(
                        jnp.max(jnp.abs(want[0] - got[0]))
                        / jnp.max(jnp.abs(got[0]))
                    )
                    results["lag_vs_pallas_rel"] = f"{rel:.2e}"
            except Exception as exc:
                results[method] = str(exc)[:120]

        print(f"--- {name} (s={s} j={j} m={m} k={k})")
        for k2, v in results.items():
            if isinstance(v, tuple):
                print(f"  {k2:8s}: best {v[0]:8.1f} us   median {v[1]:8.1f} us")
            else:
                print(f"  {k2:8s}: {v}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
