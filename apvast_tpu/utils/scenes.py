"""Named benchmark scenes (BASELINE.json configs).

The reference ships one scene (8 loudspeakers, 9 mics). The scale sweep
configurations — 16- and 32-loudspeaker 48 kHz arrays — do not ship, so
they are generated deterministically with the noise-tail RIR model.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.utils.rir import correlated_rirs, load_reference_rirs


@dataclasses.dataclass(frozen=True)
class Scene:
    name: str
    rir_a: np.ndarray
    rir_b: np.ndarray
    config: ApVastConfig


def reference_scene(**overrides) -> Scene:
    """The measured-baseline scene: bundled rirs.mat with the reference's
    fixture hyperparameters (BASELINE.md)."""
    rir_a, rir_b = load_reference_rirs()
    defaults = dict(
        block_size=1600,
        filter_length=100,
        modeling_delay=20,
        reference_index_a=7,
        reference_index_b=7,
        num_eigenvectors=50,
        mu=1.0,
        statistics_buffer_length=1000,
        sampling_rate=48000,
        perceptual=False,
        dtype="float32",
    )
    defaults.update(overrides)
    return Scene(
        "reference", rir_a, rir_b, ApVastConfig.for_rirs(rir_a, rir_b, **defaults)
    )


def scale_scene(num_srcs: int, num_mics: int | None = None, **overrides) -> Scene:
    """Synthetic 48 kHz scale scene (16/32-speaker north-star configs).

    RIRs are 2400 taps (50 ms at 48 kHz), spatially correlated and
    near-anechoic like the bundled scene; filter length is chosen so JL
    stays at the reference 800 for num_srcs = 16 and grows to 1600 for
    num_srcs = 32.
    """
    num_mics = num_mics or num_srcs + 1
    rir_len = 2400
    # Spatially-correlated near-anechoic RIRs: the independent noise-tail
    # model makes the dark field full-rank (contrast ceiling ~0 dB when
    # num_mics > num_srcs); this model matches the bundled scene's
    # character and gives a ~25 dB ceiling, so the scale scenes are
    # quality benchmarks, not just shape/performance sweeps.
    # The 1e-3 gain puts loudspeaker responses at the bundled scene's
    # measured level (~1e-3 rms digital at the 94 dB SPL calibration):
    # at unit gains every mic sits far into the masker-dominated regime
    # of the perceptual model and the wildly time-varying weighting
    # collapses broadband contrast.
    rir_a = 1e-3 * correlated_rirs(rir_len, num_srcs, num_mics, seed=101)
    rir_b = 1e-3 * correlated_rirs(rir_len, num_srcs, num_mics, seed=202)
    defaults = dict(
        block_size=1600,
        filter_length=50,
        modeling_delay=24,
        reference_index_a=0,
        reference_index_b=0,
        num_eigenvectors=50,
        mu=1.0,
        statistics_buffer_length=1000,
        sampling_rate=48000,
        perceptual=True,
        dtype="float32",
    )
    defaults.update(overrides)
    return Scene(
        f"scale{num_srcs}",
        rir_a,
        rir_b,
        ApVastConfig.for_rirs(rir_a, rir_b, **defaults),
    )
