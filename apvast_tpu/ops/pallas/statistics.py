"""Fused framing + covariance accumulation as a Pallas TPU kernel.

The XLA statistics path materializes the frame tensor
(paths, mics, srcs, K, J) — ~100 MB at the reference scale — writes it to
HBM, re-reads it for the covariance einsum, and pays a gather for the
framing. This kernel never materializes frames: each grid step DMAs two
length-N buffer rows into VMEM, builds their (J, K) sliding-window
matrices in scratch, and feeds one (J, K) x (K, J) contraction straight
to the MXU, accumulating the microphone sum in the resident output tile.

Semantics equal ``framing.frame_buffer`` + the covariance einsum in
``engine.hop`` (the deleted-sample PYTHON variant is handled by the
caller passing the sample-deleted buffer); verified element-exact against
the XLA path in tests/test_pallas_statistics.py (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(row_ref, col_ref, out_ref, wr, wc, *, frame_length, num_frames):
    j, k = frame_length, num_frames
    m = pl.program_id(3)

    def fill(i, _):
        # Window row i holds buffer[J-1-i : J-1-i+K] — forward time,
        # most-recent-lag-first row ordering (Python/apvast.py:336-338).
        wr[i, :] = row_ref[0, 0, 0, pl.ds(j - 1 - i, k)]
        wc[i, :] = col_ref[0, 0, 0, pl.ds(j - 1 - i, k)]
        return 0

    jax.lax.fori_loop(0, j, fill, 0)
    tile = jax.lax.dot_general(
        wr[:],
        wc[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m == 0)
    def _():
        out_ref[0] = tile

    @pl.when(m > 0)
    def _():
        out_ref[0] = out_ref[0] + tile


def covariance_pallas(
    buffers: jax.Array, frame_length: int, interpret: bool = False
) -> jax.Array:
    """R[p] = sum_m Y_pm Y_pm^T from sliding windows of the buffers.

    Args:
        buffers: (paths, mics, srcs, n) float32 statistics buffers
            (sample-deleted already for the PYTHON Toeplitz variant).
        frame_length: J.

    Returns:
        (paths, srcs * J, srcs * J) float32 covariance matrices.
    """
    p, m, s, n = buffers.shape
    j = frame_length
    k = n - j + 1
    grid = (p, s, s, m)

    row_spec = pl.BlockSpec(
        (1, 1, 1, n),
        lambda pi, sr, sc, mi: (pi, mi, sr, 0),
        memory_space=pltpu.VMEM,
    )
    col_spec = pl.BlockSpec(
        (1, 1, 1, n),
        lambda pi, sr, sc, mi: (pi, mi, sc, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, j, j),
        lambda pi, sr, sc, mi: (pi, sr, sc),
        memory_space=pltpu.VMEM,
    )
    # Buffers arrive (p, m, s, n); the index maps above address them as
    # (p, m, s) blocks directly.
    kernel = functools.partial(_kernel, frame_length=j, num_frames=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, col_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((p, s * j, s * j), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((j, k), jnp.float32),
            pltpu.VMEM((j, k), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * p * m * s * s * j * j * k,
            bytes_accessed=p * m * s * n * 4 * s + p * s * j * s * j * 4,
            transcendentals=0,
        ),
    )(buffers, buffers)
