"""Audio I/O and rate conversion for the experiment driver.

The reference demo loads program material with ``audioread`` and
resamples it to the processing rate (Matlab/main.m:21-26); these helpers
provide the same surface on top of scipy (float64 in [-1, 1], mono mix
and polyphase resampling).
"""

from __future__ import annotations

import numpy as np


def load_wav(path: str, target_rate: float | None = None, gain: float = 1.0):
    """Read a WAV file -> (signal, rate); mono (first channel), scaled to
    [-1, 1] floats, optionally polyphase-resampled like main.m:24."""
    import scipy.io.wavfile
    import scipy.signal

    rate, data = scipy.io.wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.uint8:
        # 8-bit PCM is unsigned with 128 = zero.
        data = (data.astype(np.float64) - 128.0) / 128.0
    elif np.issubdtype(data.dtype, np.integer):
        data = data.astype(np.float64) / float(np.iinfo(data.dtype).max)
    else:
        data = data.astype(np.float64)
    data = gain * data
    if target_rate is not None and target_rate != rate:
        from math import gcd

        g = gcd(int(target_rate), int(rate))
        data = scipy.signal.resample_poly(
            data, int(target_rate) // g, int(rate) // g
        )
        rate = int(target_rate)
    return data, rate


def save_wav(path: str, signal: np.ndarray, rate: int) -> None:
    """Write float signals (clipped to [-1, 1]) as 16-bit PCM."""
    import scipy.io.wavfile

    clipped = np.clip(np.asarray(signal), -1.0, 1.0)
    scipy.io.wavfile.write(path, int(rate), (clipped * 32767).astype(np.int16))
