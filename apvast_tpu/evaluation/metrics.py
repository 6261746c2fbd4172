"""Evaluation metrics of the reference demo, batched for TPU.

* ``predict_pressure`` — zone pressure from loudspeaker feeds and RIRs
  (Matlab/ControlMethods/predictPressure.m:1-18), as one batched FFT
  convolution instead of the reference's srcs x mics ``filter`` loop.
* ``acoustic_contrast_db`` — 10 log10 of bright/dark Frobenius energy
  ratio (Matlab/main.m:129-130).
* ``normalized_mse`` — per-mic NMSE vs the target pressure, averaged over
  mics (Matlab/main.m:120-127).
"""

from __future__ import annotations

import jax.numpy as jnp

from apvast_tpu.ops.wola import irfft_batched, rfft_batched


def predict_pressure(loudspeaker_signals, rirs):
    """Predicted zone pressure.

    Args:
        loudspeaker_signals: (..., T, srcs) feeds (leading batch axes
            allowed, e.g. the rank axis of the all-spans output).
        rirs: (rir_length, srcs, mics).

    Returns:
        (..., T, mics): sum over sources of signal (*) rir, truncated to
        T samples as scipy/MATLAB ``filter`` does.
    """
    t = loudspeaker_signals.shape[-2]
    rl = rirs.shape[0]
    nfft = 1
    while nfft < t + rl - 1:
        nfft *= 2
    sig_spec = rfft_batched(
        jnp.moveaxis(loudspeaker_signals, -1, -2), nfft
    )  # (..., srcs, nfft/2+1)
    rir_spec = rfft_batched(rirs.transpose(1, 2, 0), nfft)  # (s, m, ·)
    prod = jnp.einsum("...sf,smf->...mf", sig_spec, rir_spec)
    pressure = irfft_batched(prod, nfft)[..., :t]
    return jnp.moveaxis(pressure, -1, -2)  # (..., T, mics)


def acoustic_contrast_db(bright_pressure, dark_pressure) -> jnp.ndarray:
    """10 log10(||p_bright||_F^2 / ||p_dark||_F^2) (Matlab/main.m:129-130).
    Inputs: (..., T, mics); reduces the last two axes."""
    num = jnp.sum(bright_pressure**2, axis=(-2, -1))
    den = jnp.sum(dark_pressure**2, axis=(-2, -1))
    return 10.0 * jnp.log10(num / den)


def normalized_mse(pressure, target_pressure) -> jnp.ndarray:
    """Mic-averaged NMSE vs target pressure (Matlab/main.m:120-127).
    Inputs: (..., T, mics)."""
    err = jnp.sum((target_pressure - pressure) ** 2, axis=-2)
    ref = jnp.sum(target_pressure**2, axis=-2)
    return jnp.mean(err / ref, axis=-1)
