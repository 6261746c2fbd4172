"""N9: evaluation metrics vs the reference's filter-loop semantics
(predictPressure.m, main.m:120-130)."""

import jax.numpy as jnp
import numpy as np
import scipy.signal

from apvast_tpu.evaluation.metrics import (
    acoustic_contrast_db,
    normalized_mse,
    predict_pressure,
)


def _reference_pressure(signals, rirs):
    """predictPressure.m:12-17 as a scipy loop."""
    t, s = signals.shape
    m = rirs.shape[2]
    out = np.zeros((t, m))
    for mi in range(m):
        for si in range(s):
            out[:, mi] += scipy.signal.lfilter(rirs[:, si, mi], 1.0, signals[:, si])
    return out


def test_predict_pressure(rng):
    signals = rng.standard_normal((200, 3))
    rirs = rng.standard_normal((50, 3, 4))
    got = predict_pressure(jnp.asarray(signals), jnp.asarray(rirs))
    np.testing.assert_allclose(
        np.asarray(got), _reference_pressure(signals, rirs), rtol=1e-9, atol=1e-10
    )


def test_predict_pressure_batched(rng):
    signals = rng.standard_normal((5, 100, 2))  # rank batch
    rirs = rng.standard_normal((30, 2, 3))
    got = predict_pressure(jnp.asarray(signals), jnp.asarray(rirs))
    assert got.shape == (5, 100, 3)
    np.testing.assert_allclose(
        np.asarray(got[2]), _reference_pressure(signals[2], rirs), rtol=1e-9, atol=1e-10
    )


def test_contrast_and_nmse(rng):
    bright = rng.standard_normal((100, 4)) * 10
    dark = rng.standard_normal((100, 4))
    c = float(acoustic_contrast_db(jnp.asarray(bright), jnp.asarray(dark)))
    want = 10 * np.log10(np.sum(bright**2) / np.sum(dark**2))
    np.testing.assert_allclose(c, want, rtol=1e-10)

    target = rng.standard_normal((100, 4))
    got = float(normalized_mse(jnp.asarray(bright), jnp.asarray(target)))
    per_mic = [
        np.sum((target[:, i] - bright[:, i]) ** 2) / np.sum(target[:, i] ** 2)
        for i in range(4)
    ]
    np.testing.assert_allclose(got, np.mean(per_mic), rtol=1e-10)
    np.testing.assert_allclose(
        float(normalized_mse(jnp.asarray(target), jnp.asarray(target))), 0.0, atol=1e-12
    )
