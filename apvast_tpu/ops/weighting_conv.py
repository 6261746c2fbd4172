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


import jax
import jax.numpy as jnp
import numpy as np


def _banded_toeplitz_t(kernels: jax.Array, b: int, taps: int) -> jax.Array:
    """Transposed banded Toeplitz K^T[..., o, u] = cta[..., o - u + T - 1]
    (zero outside the band), o in [0, B), u in [0, B+T-1) — built with a
    pad-flatten-reshape shear, NO gather (a gathered build materialized
    ~36 MB/hop of relayout copies on the north-star scene: ~1.5 ms).

    kernels: (..., T) centered impulse responses (tau = -h..h)."""
    lead = kernels.shape[:-1]
    # G[d'] = flip(cta)[d' - (B-1)] inside the band, zero elsewhere.
    zeros = jnp.zeros(lead + (b - 1,), dtype=kernels.dtype)
    g = jnp.concatenate([zeros, jnp.flip(kernels, axis=-1), zeros], axis=-1)
    l = g.shape[-1]  # 2B + T - 2
    w = l + 1
    # Row o reads the window starting at B-1-o: row-dependent shift ==
    # flatten with row stride w-1 after dropping the first B-1 entries.
    tiled = jnp.broadcast_to(g[..., None, :], lead + (b, l))
    p = jnp.pad(tiled, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])
    flat = p.reshape(*lead, b * w)
    f2 = flat[..., b - 1 : b - 1 + b * (w - 1)]
    rows = f2.reshape(*lead, b, w - 1)
    return rows[..., : b + taps - 1]  # (..., B, B+T-1)


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
    x: jax.Array,
    kernels: jax.Array,
    taps: int,
    block_b: int | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Circular convolution of each row of ``x`` with its zone's kernel.

    x: (4, M, S, N) windowed response blocks in the engine's path order
    (path = 2*signal + zone, so a reshape exposes the zone axis — no
    per-path kernel gather); kernels: (2, M, T) truncated per-(zone, mic)
    weighting kernels. Returns (4, M, S, N) = c (*) x along the last
    axis.
    """
    p, m, s, n = x.shape
    if p != 4 or kernels.shape[0] != 2:
        raise ValueError("expected 4 paths and 2 zone kernel sets")
    if taps >= n:
        raise ValueError("taps must be < block (use the exact path)")
    if block_b is None:
        # A frame size near the tap count keeps the banded matmul
        # square-ish and the frame/band tensors small.
        block_b = n
        for cand in (160, 200, 128, 256, 100, 320, 400, 512, 80):
            if n % cand == 0 and cand >= (taps + 1) // 2:
                block_b = cand
                break
    b = block_b
    f = n // b
    h = taps // 2

    if impl == "auto":
        impl = (
            "pallas"
            if x.dtype == jnp.float32 and jax.default_backend() == "tpu"
            else "einsum"
        )
    if impl == "pallas":
        # Frames never touch HBM: the XLA einsum path below streams an
        # O(4 M S (N+T)) frame tensor (~18 MB/hop) through VMEM slabs.
        from apvast_tpu.ops.pallas.rowwise_conv import (
            rowwise_circular_conv_pallas,
        )

        k_t = _banded_toeplitz_t(kernels, b, taps)
        return rowwise_circular_conv_pallas(
            x, k_t, taps, b, interpret=(jax.default_backend() == "cpu")
        )

    # Circular pad by h on both sides, then F overlap-save frames.
    xp = jnp.concatenate([x[..., n - h :], x, x[..., :h]], axis=-1)
    frames = jnp.stack(
        [xp[..., i * b : i * b + b + taps - 1] for i in range(f)], axis=-2
    )  # (4, m, s, F, U=B+T-1)
    frames = frames.reshape(2, 2, m, s, f, b + taps - 1)  # (sig, zone, ...)

    k_t = _banded_toeplitz_t(kernels, b, taps)  # (2, m, B, U)
    y = jnp.einsum(
        "czmsfu,zmou->czmsfo", frames, k_t,
        preferred_element_type=x.dtype,
    )  # (sig, zone, m, s, F, B)
    return y.reshape(p, m, s, n)
