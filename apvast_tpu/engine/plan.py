"""Precomputed constants of the AP-VAST engine.

Everything the reference computes in its constructor that is *not* mutable
state lands here: the WOLA window (Python/apvast.py:94), the target RIRs
(modeling-delayed reference-speaker responses, apvast.py:101-112), the
frequency-domain RIR kernels for the streaming convolution, the delta
target playback filters (apvast.py:389-390, apVast.m:597-602) and the
calibrated perceptual tables (perceptualModel.m:30-116).

The plan is a pytree of device constants: it is passed to ``process_hop``
as a regular (traced) argument so one compiled executable serves any RIR
set with the same geometry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig, PerceptualFrontend, TargetFilterVariant
from apvast_tpu.ops.wola import sine_window
from apvast_tpu.perceptual.tables import (
    build_libdetectability_tables,
    build_perceptual_tables,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ApVastPlan:
    """Device-resident constants; all leaves are arrays."""

    # (block_size,) sine analysis/synthesis window.
    window: jax.Array
    # (2, num_mics, num_srcs, fir_fft_size // 2 + 1) complex kernel spectra
    # of [rir_A, rir_B] — index by *destination zone*.
    rir_spec: jax.Array
    # (2, num_mics, fir_fft_size // 2 + 1) complex kernel spectra of the
    # modeling-delayed target RIRs [target_A, target_B].
    target_rir_spec: jax.Array
    # (2, num_srcs, num_bins) complex spectra of the per-zone delta target
    # playback filters.
    target_filter_spec: jax.Array
    # (2, 2*m*s + m, rir_length) raw FIR kernel rows per program signal
    # for the Pallas streaming-convolution path:
    # [rir_A rows (m*s), rir_B rows (m*s), target_z rows (m)].
    conv_kernels: jax.Array
    # Matmul-DFT matrices for the WOLA transforms (None unless
    # config.use_matmul_dft): forward (block, bins) cos/sin and inverse
    # (bins, block) cos/sin with the one-sided reconstruction weights
    # AND the sine analysis/synthesis windows folded in (so the hop
    # spends no elementwise window passes over the big response tensors).
    dft_cos: jax.Array | None
    dft_sin: jax.Array | None
    idft_cos: jax.Array | None
    idft_sin: jax.Array | None
    # Inverse-cos WITHOUT the synthesis window (for consumers that need
    # the true iDFT, e.g. the truncated weighting-kernel build).
    idft_cos_plain: jax.Array | None
    # Perceptual tables (None when config.perceptual is False).
    cfmr_sq: jax.Array | None
    cs: jax.Array | None
    ca: jax.Array | None
    leff: jax.Array | None
    spectrum_scale: jax.Array | None
    # FIR-projection matrices for the FD engine's J-tap constraint
    # (spec -> first J time samples -> spec; None unless use_matmul_dft):
    # inverse (bins, J) and plain forward (J, bins) cos/sin pairs.
    proj_idft_cos: jax.Array | None = None
    proj_idft_sin: jax.Array | None = None
    proj_dft_cos: jax.Array | None = None
    proj_dft_sin: jax.Array | None = None


def _delayed_target_rir(rir: np.ndarray, ref_index: int, delay: int) -> np.ndarray:
    """(rir_length, num_mics) target RIR: the reference speaker's response
    delayed by the modeling delay (Python/apvast.py:101-112)."""
    ref = rir[:, ref_index, :]  # (rir_length, num_mics)
    out = np.zeros_like(ref)
    out[delay:, :] = ref[: ref.shape[0] - delay, :]
    return out


def build_plan(
    config: ApVastConfig, rir_a: np.ndarray, rir_b: np.ndarray
) -> ApVastPlan:
    """Precompute all engine constants for one scene.

    ``rir_a`` / ``rir_b`` use the reference layout
    ``(rir_length, num_srcs, num_mics)`` (Python/apvast.py:97-99).
    """
    expected = (config.rir_length, config.num_srcs, config.num_mics)
    if rir_a.shape != expected or rir_b.shape != expected:
        raise ValueError(
            f"RIR shape {rir_a.shape}/{rir_b.shape} does not match config {expected}"
        )
    dtype = jnp.dtype(config.dtype)
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "config.dtype='float64' requires jax_enable_x64 (parity mode)"
        )

    rir_a = np.asarray(rir_a, dtype=dtype)
    rir_b = np.asarray(rir_b, dtype=dtype)
    nf = config.fir_fft_size

    # Kernel layout: time axis last, (mics, srcs, taps). The FFTs run ON
    # DEVICE via a jit from real inputs: the TPU runtime in this
    # environment cannot host-transfer complex arrays, and device-born
    # complex spectra avoid the transfer entirely (real arrays H2D fine).
    kernels = np.stack(
        [rir_a.transpose(2, 1, 0), rir_b.transpose(2, 1, 0)]
    )  # (2, m, s, taps) real

    tgt_a = _delayed_target_rir(rir_a, config.reference_index_a, config.modeling_delay)
    tgt_b = _delayed_target_rir(rir_b, config.reference_index_b, config.modeling_delay)
    target_kernels = np.stack([tgt_a.T, tgt_b.T])  # (2, m, taps) real

    # Delta target playback filters, laid out (srcs, filter_length) with
    # time last; the Python variant reuses zone A's filter for both zones
    # (apvast.py:389-390), the MATLAB variant is per-zone (apVast.m:597-602).
    def delta_filter(ref_index: int) -> np.ndarray:
        f = np.zeros((config.num_srcs, config.filter_length), dtype=dtype)
        f[ref_index, config.modeling_delay] = 1.0
        return f

    if config.target_filter is TargetFilterVariant.SHARED_A:
        shared = delta_filter(config.reference_index_a)
        target_filters = np.stack([shared, shared])
    else:
        target_filters = np.stack(
            [
                delta_filter(config.reference_index_a),
                delta_filter(config.reference_index_b),
            ]
        )

    @jax.jit
    def _device_spectra(kernels, target_kernels, target_filters):
        return (
            jnp.fft.rfft(kernels, n=nf, axis=-1),
            jnp.fft.rfft(target_kernels, n=nf, axis=-1),
            jnp.fft.rfft(target_filters, n=config.block_size, axis=-1),
        )

    rir_spec, target_rir_spec, target_filter_spec = _device_spectra(
        jnp.asarray(kernels), jnp.asarray(target_kernels), jnp.asarray(target_filters)
    )

    cfmr_sq = cs = ca = leff = spectrum_scale = None
    if config.perceptual:
        if config.perceptual_frontend is PerceptualFrontend.LIBDETECTABILITY:
            tables = build_libdetectability_tables(
                config.block_size,
                float(config.sampling_rate),
                config.perceptual_taps,
            )
        else:
            tables = build_perceptual_tables(
                config.block_size,
                float(config.sampling_rate),
                config.pressure_scale_db_spl,
                config.threshold_method,
            )
        cfmr_sq = jnp.asarray(tables.cfmr_sq, dtype=dtype)
        cs = jnp.asarray(tables.cs, dtype=dtype)
        ca = jnp.asarray(tables.ca, dtype=dtype)
        leff = jnp.asarray(tables.leff, dtype=dtype)
        spectrum_scale = jnp.asarray(tables.spectrum_scale, dtype=dtype)

    # Raw kernel rows for the Pallas streaming-convolution path.
    rir_rows = kernels.reshape(2, -1, config.rir_length)  # (2=AB, m*s, taps)
    conv_kernels = np.stack(
        [
            np.concatenate([rir_rows[0], rir_rows[1], target_kernels[0]]),
            np.concatenate([rir_rows[0], rir_rows[1], target_kernels[1]]),
        ]
    )

    dft_cos = dft_sin = idft_cos = idft_sin = idft_cos_plain = None
    proj_idft_cos = proj_idft_sin = proj_dft_cos = proj_dft_sin = None
    if config.use_matmul_dft:
        block = config.block_size
        ang = (
            2.0
            * np.pi
            * np.outer(np.arange(block), np.arange(block // 2 + 1))
            / block
        )
        inv_w = np.full(block // 2 + 1, 2.0 / block)
        inv_w[0] = 1.0 / block
        inv_w[-1] = 1.0 / block
        # The WOLA analysis window is folded INTO the forward matrices
        # and the synthesis window into the inverse matrices:
        # (win*x) @ C == x @ (win[:,None]*C) term for term, so the
        # per-hop elementwise window passes over the (paths, mics, srcs,
        # block) response tensors disappear into the existing matmuls.
        win = np.asarray(sine_window(block, dtype=dtype))
        dft_cos = jnp.asarray(win[:, None] * np.cos(ang), dtype=dtype)
        dft_sin = jnp.asarray(win[:, None] * np.sin(ang), dtype=dtype)
        idft_cos = jnp.asarray((np.cos(ang) * inv_w).T * win[None, :], dtype=dtype)
        idft_sin = jnp.asarray((np.sin(ang) * inv_w).T * win[None, :], dtype=dtype)
        idft_cos_plain = jnp.asarray((np.cos(ang) * inv_w).T, dtype=dtype)
        # FD J-tap projection: only the first filter_length time samples
        # of the inverse transform are kept, so both directions are thin
        # (bins x J) / (J x bins) MXU contractions instead of FFT round
        # trips (engine/fd_hop.py filter constraint).
        j = config.filter_length
        proj_idft_cos = jnp.asarray((np.cos(ang[:j]) * inv_w).T, dtype=dtype)
        proj_idft_sin = jnp.asarray((np.sin(ang[:j]) * inv_w).T, dtype=dtype)
        proj_dft_cos = jnp.asarray(np.cos(ang[:j]), dtype=dtype)
        proj_dft_sin = jnp.asarray(np.sin(ang[:j]), dtype=dtype)

    return ApVastPlan(
        window=sine_window(config.block_size, dtype=dtype),
        conv_kernels=jnp.asarray(conv_kernels),
        rir_spec=jnp.asarray(rir_spec),
        target_rir_spec=jnp.asarray(target_rir_spec),
        target_filter_spec=jnp.asarray(target_filter_spec),
        dft_cos=dft_cos,
        dft_sin=dft_sin,
        idft_cos=idft_cos,
        idft_sin=idft_sin,
        idft_cos_plain=idft_cos_plain,
        proj_idft_cos=proj_idft_cos,
        proj_idft_sin=proj_idft_sin,
        proj_dft_cos=proj_dft_cos,
        proj_dft_sin=proj_dft_sin,
        cfmr_sq=cfmr_sq,
        cs=cs,
        ca=ca,
        leff=leff,
        spectrum_scale=spectrum_scale,
    )
