"""Room impulse responses: the bundled reference scene and a synthetic
generator for scale sweeps.

The reference ships one scene, ``Python/rirs.mat`` with ``rirA``/``rirB``
shaped (800, 8, 9) = (rir_length, num_srcs, num_mics)
(Python/apvast.py:97-99). Larger scenes (16/32 loudspeakers — the
BASELINE.json sweep configs) do not ship, so this module also provides a
deterministic noise-tail RIR model: per (src, mic) a random propagation
delay, a direct-path spike and an exponentially decaying diffuse tail —
the standard surrogate for sound-zone simulation studies.
"""

from __future__ import annotations

import os

import numpy as np

_REFERENCE_RIRS = "/root/reference/Python/rirs.mat"


def load_reference_rirs(path: str | None = None):
    """Load the bundled scene if available, else a matched synthetic one.

    Returns (rir_a, rir_b) each (800, 8, 9) float64.
    """
    path = path or _REFERENCE_RIRS
    if os.path.exists(path):
        import scipy.io

        data = scipy.io.loadmat(path)
        return np.ascontiguousarray(data["rirA"]), np.ascontiguousarray(data["rirB"])
    return (
        synthetic_rirs(800, 8, 9, seed=11),
        synthetic_rirs(800, 8, 9, seed=13),
    )


def from_vast_layout(rirs: np.ndarray) -> np.ndarray:
    """Convert the offline vast.m RIR layout (numberOfMics, rirLength,
    numberOfSrc — Matlab/ControlMethods/vast.m:10-17) to the framework's
    (rirLength, numberOfSrc, numberOfMics)."""
    return np.ascontiguousarray(np.transpose(rirs, (1, 2, 0)))


def synthetic_rirs(
    rir_length: int,
    num_srcs: int,
    num_mics: int,
    seed: int = 0,
    sampling_rate: float = 8000.0,
    rt60: float = 0.25,
    min_delay: int = 8,
) -> np.ndarray:
    """Deterministic noise-tail RIRs, shape (rir_length, srcs, mics)."""
    rng = np.random.default_rng(seed)
    t = np.arange(rir_length) / sampling_rate
    decay = 10.0 ** (-3.0 * t / rt60)  # -60 dB at rt60
    rirs = np.zeros((rir_length, num_srcs, num_mics))
    for s in range(num_srcs):
        for m in range(num_mics):
            delay = int(rng.integers(min_delay, min_delay + rir_length // 16))
            direct_gain = 1.0 / (1.0 + 0.05 * delay)
            tail = rng.standard_normal(rir_length) * decay * 0.3 * direct_gain
            h = np.roll(tail, delay)
            h[:delay] = 0.0
            h[delay] += direct_gain
            rirs[:, s, m] = h
    return rirs
