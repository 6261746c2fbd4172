"""Streaming FIR convolution by batched overlap-save FFT.

Replaces the reference's per-(src, mic) ``scipy.signal.lfilter`` loop —
``M * (4L + 2)`` stateful calls per hop (Python/apvast.py:167-194,
Matlab/ControlMethods/apVast.m:257-286) — with a single batched frequency
domain product. Because the filters are pure FIR, the lfilter delay-line
state is equivalent to carrying the last ``fft_size - hop`` input samples,
so *one* history vector per program signal replaces all per-path states.

Exactness: with ``fft_size >= rir_length + hop - 1`` the circular
convolution of the (history ++ hop) segment is free of wraparound on the
last ``hop`` samples, so the result equals the direct convolution to
roundoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apvast_tpu.ops.wola import irfft_batched, rfft_batched


def fir_kernel_spectra(kernels: jax.Array, fft_size: int) -> jax.Array:
    """Precompute rfft of FIR kernels. ``kernels``: (..., taps)."""
    return rfft_batched(kernels, fft_size)


def streaming_fir(
    history: jax.Array,
    hop_samples: jax.Array,
    kernel_spectra: jax.Array,
):
    """Advance the streaming convolution by one hop.

    Args:
        history: (fft_size - hop,) carried input samples (zeros at start,
            matching the reference's zero lfilter states, apvast.py:114-120).
        hop_samples: (hop,) new input samples.
        kernel_spectra: (..., fft_size // 2 + 1) precomputed kernel rffts;
            leading axes are arbitrary batch axes (mics, srcs, paths).

    Returns:
        (new_history, outputs) with outputs shaped (..., hop): for every
        kernel, the convolution outputs aligned with ``hop_samples``.
    """
    hop = hop_samples.shape[-1]
    segment = jnp.concatenate([history, hop_samples])
    fft_size = segment.shape[-1]
    seg_spec = jnp.fft.rfft(segment)
    full = irfft_batched(kernel_spectra * seg_spec, fft_size)
    outputs = full[..., fft_size - hop :]
    new_history = segment[hop:]
    return new_history, outputs
