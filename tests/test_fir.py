"""N5: streaming overlap-save FIR convolution vs scipy lfilter with
carried state (the reference's RIR convolution, Python/apvast.py:167-194)."""

import jax.numpy as jnp
import numpy as np
import scipy.signal

from apvast_tpu.ops.fir import fir_kernel_spectra, streaming_fir


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def test_matches_stateful_lfilter(rng):
    taps, hop, hops = 100, 64, 7
    kernels = rng.standard_normal((3, 5, taps))  # (mics, srcs, taps)
    signal = rng.standard_normal(hop * hops)

    fft_size = _next_pow2(taps + hop - 1)
    kspec = fir_kernel_spectra(jnp.asarray(kernels), fft_size)
    history = jnp.zeros(fft_size - hop)

    zi = np.zeros((3, 5, taps - 1))
    for h in range(hops):
        chunk = signal[h * hop : (h + 1) * hop]
        history, ours = streaming_fir(history, jnp.asarray(chunk), kspec)
        for mi in range(3):
            for si in range(5):
                want, zi[mi, si] = scipy.signal.lfilter(
                    kernels[mi, si], 1.0, chunk, zi=zi[mi, si]
                )
                np.testing.assert_allclose(
                    np.asarray(ours[mi, si]), want, rtol=1e-10, atol=1e-12
                )


def test_short_kernel_long_history(rng):
    """History longer than taps-1 (fft rounding) must not change results."""
    taps, hop = 9, 16
    kernel = rng.standard_normal(taps)
    signal = rng.standard_normal(hop * 4)
    fft_size = _next_pow2(taps + hop - 1)  # 32 -> history 16 > taps-1
    kspec = fir_kernel_spectra(jnp.asarray(kernel), fft_size)
    history = jnp.zeros(fft_size - hop)
    got = []
    for h in range(4):
        history, out = streaming_fir(
            history, jnp.asarray(signal[h * hop : (h + 1) * hop]), kspec
        )
        got.append(np.asarray(out))
    want = scipy.signal.lfilter(kernel, 1.0, signal)
    np.testing.assert_allclose(np.concatenate(got), want, rtol=1e-10, atol=1e-12)
