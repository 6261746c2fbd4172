"""Per-frame perceptual weighting — pure JAX, jit/vmap-safe.

Evaluates the van de Par detectability weighting curve for a batch of
one-sided masker spectra and returns the gain applied to the WOLA spectra
(Python/apvast.py:313-327, Matlab/ControlMethods/perceptualModel.m:118-139
+ apVast.m:386-408).

The squared weighting curve is
    w^2(f) = Cs * Leff * sum_ch  g_ch^2(f) / (P_ch + Ca)
with per-channel masker power
    P_ch = sum_f g_ch^2(f) |S(f)|^2
where g_ch is the combined outer-middle-ear x gammatone response and S the
sqrt(2)/N-scaled masker spectrum. Both sums are single MXU-friendly
matmuls against the precomputed (bins, channels) table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apvast_tpu.config import WeightingNorm


def squared_weighting(
    spectra: jax.Array,
    cfmr_sq: jax.Array,
    cs: float,
    ca: float,
    leff: float,
    spectrum_scale: float,
) -> jax.Array:
    """The un-normalized squared weighting curve w^2(f) of masker spectra
    (perceptualModel.m:118-139). ``spectra``: (..., bins) raw rfft."""
    power = jnp.abs(spectra * spectrum_scale) ** 2
    masker = jnp.einsum(
        "...f,fc->...c", power, cfmr_sq, preferred_element_type=power.dtype
    )
    return (cs * leff) * jnp.einsum(
        "fc,...c->...f",
        cfmr_sq,
        1.0 / (masker + ca),
        preferred_element_type=power.dtype,
    )


def perceptual_gain(
    spectra: jax.Array,
    cfmr_sq: jax.Array,
    cs: float,
    ca: float,
    leff: float,
    spectrum_scale: float,
    norm: WeightingNorm,
) -> jax.Array:
    """Weighting gains for raw (unscaled) one-sided masker spectra.

    Args:
        spectra: (..., bins) complex rfft of the windowed masker block
            (the engine's raw spectra — the model applies its own
            sqrt(2)/N scaling internally, matching both the MATLAB wiring
            at apVast.m:299-300 and the Python wiring where the model
            re-derives the spectrum from the time frame, apvast.py:318).
        cfmr_sq: (bins, channels) squared channel-frequency response.
        norm: post-normalization variant (see WeightingNorm).

    Returns:
        (..., bins) real gains.
    """
    w_sq = squared_weighting(spectra, cfmr_sq, cs, ca, leff, spectrum_scale)
    gain = jnp.sqrt(w_sq)
    if norm is WeightingNorm.UNIT_ONESIDED:
        # Python/apvast.py:322-324 normalizes the one-sided vector.
        gain = gain / jnp.linalg.norm(gain, axis=-1, keepdims=True)
    elif norm is WeightingNorm.UNIT_SYMMETRIC:
        # perceptualModel.m:177-190 normalizes the length-N symmetric
        # extension [w; flip(w[1:-1])] — include the interior bins twice.
        sym_sq = jnp.sum(gain**2, axis=-1, keepdims=True) + jnp.sum(
            gain[..., 1:-1] ** 2, axis=-1, keepdims=True
        )
        gain = gain / jnp.sqrt(sym_sq)
    elif norm is WeightingNorm.PRESSURE:
        # perceptualModel.m:162-175: center the curve around 1 digital
        # full-scale rather than 20 uPa.
        gain = gain * 20e-6
    return gain


def detectability(
    test_spectra: jax.Array,
    masker_gain_sq: jax.Array,
) -> jax.Array:
    """Detectability D = sum_{f>0} w^2(f) |T(f)|^2 of a test signal under a
    masker-derived squared weighting curve (perceptualModel.m:192-221).

    ``test_spectra``: (..., bins) raw rfft of the test block *already
    scaled* by sqrt(2)/N; ``masker_gain_sq``: (..., bins) squared
    weighting curve (un-normalized, i.e. WeightingNorm.NONE gains squared).
    The DC bin is excluded, as in the reference.
    """
    power = jnp.abs(test_spectra) ** 2
    return jnp.sum(masker_gain_sq[..., 1:] * power[..., 1:], axis=-1)
