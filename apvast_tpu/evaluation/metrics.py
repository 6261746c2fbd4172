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
    from apvast_tpu.config import _next_pow2

    t = loudspeaker_signals.shape[-2]
    rl = rirs.shape[0]
    nfft = _next_pow2(t + rl - 1)
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


def detectability(test_blocks, masker_blocks, tables) -> jnp.ndarray:
    """Perceptual detectability of test signal blocks under masker blocks
    (Matlab/ControlMethods/perceptualModel.m:192-221):
    D = sum_{f>0} w_masker^2(f) |T(f)|^2 per block.

    Args:
        test_blocks: (..., block) time blocks of the signal to judge
            (e.g. reproduction error or dark-zone leakage).
        masker_blocks: (..., block) time blocks of the masking signal
            (e.g. the target-zone pressure).
        tables: a :class:`apvast_tpu.perceptual.PerceptualTables`.

    Returns: (...,) detectability per block. D = 1 is the masked
    threshold by calibration; D >> 1 is clearly audible.
    """
    from apvast_tpu.perceptual.model import detectability as _d
    from apvast_tpu.perceptual.model import squared_weighting

    cfmr_sq = jnp.asarray(tables.cfmr_sq, dtype=test_blocks.dtype)
    masker_spec = rfft_batched(masker_blocks, masker_blocks.shape[-1])
    w_sq = squared_weighting(
        masker_spec, cfmr_sq, tables.cs, tables.ca, tables.leff,
        tables.spectrum_scale,
    )
    test_spec = (
        rfft_batched(test_blocks, test_blocks.shape[-1]) * tables.spectrum_scale
    )
    return _d(test_spec, w_sq)
