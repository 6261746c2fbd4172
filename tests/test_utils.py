"""Utilities: scenes, audio I/O, synthetic RIRs."""

import numpy as np

from apvast_tpu.utils.io import load_wav, save_wav
from apvast_tpu.utils.rir import synthetic_rirs
from apvast_tpu.utils.scenes import reference_scene, scale_scene


def test_reference_scene_shapes():
    scene = reference_scene()
    assert scene.rir_a.shape == (800, 8, 9)
    assert scene.config.jl == 800
    assert scene.config.dtype == "float32"


def test_scale_scenes():
    s16 = scale_scene(16)
    assert s16.rir_a.shape == (2400, 16, 17)
    assert s16.config.jl == 800  # J=50 keeps the GEVD at reference size
    s32 = scale_scene(32, num_mics=33)
    assert s32.config.jl == 1600
    # Deterministic.
    again = scale_scene(16)
    np.testing.assert_array_equal(s16.rir_a, again.rir_a)


def test_synthetic_rirs_properties():
    r = synthetic_rirs(200, 3, 2, seed=5)
    assert r.shape == (200, 3, 2)
    # Causal direct path: leading samples before the minimum delay are 0.
    assert np.all(r[:8] == 0.0)
    # Energy decays along the tail.
    assert np.sum(r[:100] ** 2) > np.sum(r[100:] ** 2)


def test_wav_roundtrip(tmp_path, rng):
    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0)
    path = str(tmp_path / "t.wav")
    save_wav(path, sig, 8000)
    back, rate = load_wav(path)
    assert rate == 8000
    np.testing.assert_allclose(back, sig, atol=1e-3)
    # Resampling halves the length.
    half, rate2 = load_wav(path, target_rate=4000)
    assert rate2 == 4000 and abs(len(half) - 4000) <= 4
    # Gain applies before resampling.
    loud, _ = load_wav(path, gain=2.0)
    np.testing.assert_allclose(loud, 2 * back, atol=1e-6)


def test_from_vast_layout(rng):
    from apvast_tpu.utils.rir import from_vast_layout

    g = rng.standard_normal((3, 40, 2))  # (mics, rirLen, srcs)
    out = from_vast_layout(g)
    assert out.shape == (40, 2, 3)
    np.testing.assert_array_equal(out[:, 1, 2], g[2, :, 1])


def test_load_wav_uint8(tmp_path):
    import scipy.io.wavfile

    sig = 0.25 * np.sin(2 * np.pi * 200 * np.arange(4000) / 8000.0)
    path = str(tmp_path / "u8.wav")
    scipy.io.wavfile.write(path, 8000, ((sig * 127) + 128).astype(np.uint8))
    back, rate = load_wav(path)
    assert rate == 8000
    assert abs(float(back.mean())) < 0.02  # no DC offset
    np.testing.assert_allclose(back, sig, atol=2e-2)
