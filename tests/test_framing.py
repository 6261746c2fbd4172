"""N2: statistics framing vs the reference's explicit Toeplitz matrices —
including the scipy corner-override off-by-one (survey §2b.1)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from apvast_tpu.config import ToeplitzVariant
from apvast_tpu.ops.framing import frame_buffer, statistics_matrices


def _reference_python_y(buf, j):
    """Y exactly as Python/apvast.py:336-338 builds it (single source)."""
    return scipy.linalg.toeplitz(np.flipud(buf[:j]), buf[j:])


def _reference_matlab_y(buf, j):
    """Y as Matlab/ControlMethods/apVast.m:422 builds it."""
    return scipy.linalg.toeplitz(np.flipud(buf[:j]), buf[j - 1 :])


def _y_from_frames(frames):
    """(k, j) forward-time frames -> reference Y layout (j, k)."""
    return np.asarray(frames)[:, ::-1].T


def test_python_variant_equals_scipy_toeplitz(rng):
    n, j = 40, 7
    buf = rng.standard_normal(n)
    frames = frame_buffer(jnp.asarray(buf), j, ToeplitzVariant.PYTHON)
    assert frames.shape == (n - j, j)
    np.testing.assert_allclose(_y_from_frames(frames), _reference_python_y(buf, j))


def test_matlab_variant_equals_matlab_toeplitz(rng):
    n, j = 40, 7
    buf = rng.standard_normal(n)
    frames = frame_buffer(jnp.asarray(buf), j, ToeplitzVariant.MATLAB)
    assert frames.shape == (n - j + 1, j)
    np.testing.assert_allclose(_y_from_frames(frames), _reference_matlab_y(buf, j))


def test_statistics_match_reference_accumulation(rng):
    """R = sum_m Y Y^T and r = sum_m Y d[j:] against the explicit loop
    (Python/apvast.py:332-340)."""
    m, s, n, j = 3, 2, 30, 5
    bufs = rng.standard_normal((m, s, n))
    target = rng.standard_normal((m, n))

    frames = frame_buffer(jnp.asarray(bufs), j, ToeplitzVariant.PYTHON)
    r_mat, r_vec = statistics_matrices(frames, jnp.asarray(target), j)

    jl = s * j
    want_r = np.zeros((jl, jl))
    want_v = np.zeros(jl)
    for mi in range(m):
        y = np.concatenate(
            [_reference_python_y(bufs[mi, si], j) for si in range(s)], axis=0
        )
        want_r += y @ y.T
        want_v += y @ target[mi, j:]
    np.testing.assert_allclose(np.asarray(r_mat), want_r, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_vec), want_v, rtol=1e-10, atol=1e-10)
