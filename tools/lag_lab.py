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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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
        for method in ("conv", "matmul"):
            fn = jax.jit(
                lambda b, t, meth=method: covariance_via_lags(
                    b, t, j, c0_method=meth
                )
            )
            try:
                best, med = _bench(fn, buf, d, reps=reps)
                got = fn(buf, d)
                if want is None:
                    want = got
                results[method] = (best, med)
            except Exception as exc:
                results[method] = str(exc)[:120]

        try:
            from apvast_tpu.ops.pallas.statistics import covariance_pallas

            interp = jax.default_backend() == "cpu"
            fnp = jax.jit(
                lambda b, t: covariance_pallas(b, t, j, interpret=interp)
            )
            best, med = _bench(fnp, buf, d, reps=reps)
            results["pallas"] = (best, med)
            rp, _ = fnp(buf, d)
            if want is not None:
                rel = float(
                    jnp.max(jnp.abs(want[0] - rp))
                    / jnp.max(jnp.abs(rp))
                )
                results["lag_vs_pallas_rel"] = f"{rel:.2e}"
        except Exception as exc:
            results["pallas"] = str(exc)[:120]

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
