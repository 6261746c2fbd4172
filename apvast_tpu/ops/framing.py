"""Toeplitz-free statistics engine (spatial correlation matrices).

The reference builds, per microphone and per source, an explicit Toeplitz
data matrix and accumulates ``R += Y @ Y.T`` and ``r += Y @ d``
(Python/apvast.py:329-364, Matlab/ControlMethods/apVast.m:410-484). On TPU
the Toeplitz matrices are never materialized as such: the buffers are read
out as strided frames (a gather with a static index grid) and the
correlations contract over the frame axis with batched einsums that run on
the MXU, with the microphone sum folded into the same contraction.

Python-variant frame semantics (ToeplitzVariant.PYTHON): the reference
calls ``scipy.linalg.toeplitz(flipud(buf[:J]), buf[J:])`` whose corner
override replaces ``r[0]`` by ``c[0]``. Algebraically the resulting matrix
is exactly the standard Toeplitz frame matrix of the buffer *with the
sample at index J deleted* (and J-1 trailing frames fewer). The
implementation therefore deletes ``buf[J]`` and frames contiguously; the
equivalence is verified against scipy in tests/test_framing.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apvast_tpu.config import ToeplitzVariant


def frame_buffer(
    buffer: jax.Array, frame_length: int, variant: ToeplitzVariant
) -> jax.Array:
    """Read a sliding-window frame matrix out of a time buffer.

    Args:
        buffer: (..., N) weighted-response statistics buffer.
        frame_length: J, the control-filter length.
        variant: see module docstring.

    Returns:
        frames: (..., K, J) where frame k holds ``buffer[k : k + J]``
        (of the possibly sample-deleted buffer) in forward time order and
        K = N - J (PYTHON) or N - J + 1 (MATLAB).
    """
    j = frame_length
    if variant is ToeplitzVariant.PYTHON:
        buffer = jnp.concatenate(
            [buffer[..., :j], buffer[..., j + 1 :]], axis=-1
        )
        num_frames = buffer.shape[-1] - j + 1  # == N - J
    else:
        num_frames = buffer.shape[-1] - j + 1  # == N - J + 1
    idx = jnp.arange(num_frames)[:, None] + jnp.arange(j)[None, :]
    return buffer[..., idx]


def statistics_matrices(
    frames: jax.Array, target: jax.Array | None, frame_length: int
):
    """Contract frames into the spatial correlation matrix R (and r).

    Args:
        frames: (M, S, K, J) frames of the weighted loudspeaker responses
            for one signal->zone path.
        target: (M, N) weighted target buffer for this zone, or None.
        frame_length: J.

    Returns:
        (R, r): R is (S*J, S*J) with the reference's block layout — row
        block s covers filter taps of source s, and within a block row i
        corresponds to lag i (most-recent-first, matching the flipped
        Toeplitz columns at Python/apvast.py:336-338). r is (S*J,) or None.

    The microphone sum of the reference's accumulation loop
    (Python/apvast.py:332-364) is folded into the contraction.
    """
    # Y[m, s*J + i, k] = frames[m, s, k, J - 1 - i]: reverse the tap axis
    # and move it ahead of the frame axis.
    m, s, k, j = frames.shape
    y = jnp.flip(frames, axis=-1).transpose(0, 1, 3, 2).reshape(m, s * j, k)
    r_mat = jnp.einsum("mak,mbk->ab", y, y, preferred_element_type=y.dtype)
    r_vec = None
    if target is not None:
        # The target is not framed, just aligned: the last K samples of the
        # buffer are exactly the reference's ``Y @ buf[J:]`` pairing for the
        # PYTHON variant (Python/apvast.py:340, K = N - J) and the
        # ``Y * buf(J:end)`` pairing for MATLAB (apVast.m:427, K = N - J + 1).
        d = target[..., -k:]
        r_vec = jnp.einsum("mak,mk->a", y, d, preferred_element_type=y.dtype)
    return r_mat, r_vec
