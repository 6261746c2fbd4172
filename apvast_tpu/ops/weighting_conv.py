"""Perceptual weighting as a truncated time-domain circular convolution.

The reference applies the per-microphone perceptual weighting by a full
spectral multiply inside the WOLA round trip (Python/apvast.py:208-209,
263-268): y = win * irfft(W * rfft(win * x)). For the loudspeaker
responses that round trip is the engine's largest non-covariance matmul
load (~5.6 GFLOP/hop on the north-star scene: 4*M*S rows through two
(block x bins) DFT matmuls each way) — yet the weighting curve is a
smooth gammatone mixture, so its impulse response ``c = irfft(W)`` decays
in a few dozen taps. Truncating c to T << block taps turns the whole
round trip into a banded circular convolution:

    y = win * (c_T (*) (win * x)),

evaluated as overlap-save frames against a per-mic (B+T-1, B) banded
Toeplitz — one batched MXU matmul ~10x smaller than the DFT pair. The
truncation is an approximation (production only, quality-gated like the
other float32 kernels); T = block reproduces the exact path to rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _band_index(b: int, taps: int) -> tuple[np.ndarray, np.ndarray]:
    """Static gather map for the banded Toeplitz K[u, o] = c[o - u + h]
    (zero outside the band), u in [0, B+T-1), o in [0, B)."""
    u = np.arange(b + taps - 1)[:, None]
    o = np.arange(b)[None, :]
    tap = o - u + taps - 1  # c stored as tau = -h..h -> index 0..T-1
    mask = (tap >= 0) & (tap < taps)
    return np.where(mask, tap, 0).astype(np.int32), mask


def weighting_kernel(
    weighting: jax.Array,
    block: int,
    taps: int,
    idft_cos: jax.Array | None = None,
) -> jax.Array:
    """Centered T-tap impulse response of the (real) weighting curves.

    weighting: (..., bins) one-sided real gains. When the plan carries
    matmul-DFT matrices, ``idft_cos`` (bins, block) keeps the kernel
    construction FFT-free (the tunnel rejects some composed FFT graphs);
    otherwise an irfft is used. Returns (..., T) with tau = -h..h at
    indices 0..T-1."""
    h = taps // 2
    if idft_cos is not None:
        c_full = jnp.einsum(
            "...k,kn->...n", weighting, idft_cos,
            preferred_element_type=weighting.dtype,
        )  # (..., block) == irfft(weighting)
    else:
        from apvast_tpu.ops.wola import irfft_batched

        c_full = irfft_batched(weighting.astype(jnp.complex128 if
                               weighting.dtype == jnp.float64 else
                               jnp.complex64), block).astype(weighting.dtype)
    return jnp.concatenate(
        [c_full[..., block - h :], c_full[..., : h + 1]], axis=-1
    )


def circular_weighting_conv(
    x: jax.Array, kernels: jax.Array, taps: int, block_b: int | None = None
) -> jax.Array:
    """Circular convolution of each row of ``x`` with its group's kernel.

    x: (P, M, S, N) windowed response blocks; kernels: (P, M, T) — the
    per-(path, mic) truncated weighting kernels (already gathered from
    zones). Returns (P, M, S, N) = c (*) x along the last axis.
    """
    p, m, s, n = x.shape
    if taps >= n:
        raise ValueError("taps must be < block (use the exact path)")
    if block_b is None:
        # Largest divisor of n not exceeding ~2*taps keeps the frame
        # matmul square-ish; fall back to n (single frame).
        block_b = n
        for cand in (512, 400, 320, 256, 200, 160, 128, 100, 80):
            if n % cand == 0 and cand >= taps // 2:
                block_b = cand
                break
    b = block_b
    f = n // b
    h = taps // 2

    # Circular pad by h on both sides, then F overlap-save frames.
    xp = jnp.concatenate([x[..., n - h :], x, x[..., :h]], axis=-1)
    frames = jnp.stack(
        [xp[..., i * b : i * b + b + taps - 1] for i in range(f)], axis=-2
    )  # (p, m, s, F, B+T-1)

    tap_idx, mask = _band_index(b, taps)
    k_band = jnp.where(
        jnp.asarray(mask), kernels[..., jnp.asarray(tap_idx)], 0.0
    )  # (p, m, B+T-1, B)

    y = jnp.einsum(
        "pmsfu,pmuo->pmsfo", frames, k_band,
        preferred_element_type=x.dtype,
    )  # (p, m, s, F, B)
    return y.reshape(p, m, s, n)
