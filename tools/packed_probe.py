#!/usr/bin/env python
"""ONE careful TPU compile of the packed large-SJ covariance kernel at
the 32-speaker geometry (its first device compile — 4D packed output
blocks are the novel Mosaic surface). Run before any engine-integrated
measurement so a compile failure is isolated here, not mid-campaign.

Usage: packed_probe.py [variant=packed|panels]
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

from apvast_tpu.ops.pallas.statistics import covariance_pallas  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "packed"
    s, j, m, n = 32, 50, 33, 999
    k = n - j + 1
    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((2, m, k)), jnp.float32)
    fn = jax.jit(
        lambda b, t: covariance_pallas(b, t, j, large_sj=variant)
    )
    print(f"# COMPILE {variant} sj={s * j}", flush=True)
    t0 = time.time()
    r, c = fn(buf, d)
    chk = float(jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(c)))
    print(f"# COMPILED {variant} {time.time() - t0:.1f}s", flush=True)
    # Correctness on-device vs the straight einsum on a symmetry probe:
    # R must be symmetric and finite.
    asym = float(jnp.max(jnp.abs(r - r.swapaxes(-1, -2))))
    scale = float(jnp.max(jnp.abs(r)))
    ok = np.isfinite(chk) and asym <= 1e-4 * scale
    print(
        {
            "variant": variant,
            "compile_plus_run_s": round(time.time() - t0, 1),
            "checksum_finite": bool(np.isfinite(chk)),
            "max_asymmetry_rel": asym / scale if scale else 0.0,
            "ok": bool(ok),
        },
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
