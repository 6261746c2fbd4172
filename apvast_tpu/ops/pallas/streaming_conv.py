"""Streaming RIR convolution as a windows-matmul kernel.

Stage 1 of the engine convolves two program segments with every RIR path
(reference: 306 lfilter calls, Python/apvast.py:167-194; XLA path: one
overlap-save FFT batch). The RIRs are finite (taps ~ 800), so the H
valid outputs are exactly a (rows, taps) x (taps, H) matmul against the
segment's sliding windows — built once per signal in VMEM and contracted
on the MXU, replacing the FFT round trip.

The kernel grid is (signals, row_blocks): each step DMAs only its own
kernel row block, and the sliding-window matrix is (re)built in scratch
once per signal (first row block). Blocking matters: the full kernel
stack of a 16-speaker scene is ~11 MB and the windows ~8 MB — loading
everything at once exceeds the 16 MB VMEM budget (observed as a
compile-time scoped-vmem OOM on the north-star scene).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seg_ref, kern_ref, out_ref, windows, *, taps, hop, hist):
    zi = pl.program_id(0)
    rb = pl.program_id(1)

    # Window row k holds segment[hist - k : hist - k + hop], so
    # out[r, h] = sum_k kernel[r, k] * segment[hist + h - k] — the valid
    # streaming-convolution outputs aligned with the new hop samples.
    # Built once per signal (the row-block axis iterates fastest).
    @pl.when(rb == 0)
    def _():
        for k in range(taps):
            start = hist - k
            windows[k, :] = seg_ref[zi, start : start + hop]

    out_ref[0] = jax.lax.dot_general(
        kern_ref[0],
        windows[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )





def streaming_conv_pallas(
    segments: jax.Array,
    kernels: jax.Array,
    hop: int,
    interpret: bool = False,
) -> jax.Array:
    """Valid streaming-convolution outputs for stacked FIR kernels.

    Args:
        segments: (signals, seg_len) — carried history ++ new hop samples
            (seg_len - hop >= taps - 1 so every window is in range).
        kernels: (signals, rows, taps) float32 FIR kernels.
        hop: number of new output samples per kernel.

    Returns:
        (signals, rows, hop) — for each kernel row, the convolution
        outputs aligned with the hop samples (== lfilter with carried
        state, == the overlap-save FFT path).
    """
    z, seg_len = segments.shape
    _, rows, taps = kernels.shape
    hist = seg_len - hop
    if hist < taps - 1:
        raise ValueError("segment history shorter than taps - 1")
    # Row blocks of 192 (divisible by 8, ~1.8 MB of taps each at 2400
    # taps); rows padded up with zero kernels and sliced off the output.
    rows_b = min(192, -(-rows // 8) * 8)
    nb = -(-rows // rows_b)
    pad = nb * rows_b - rows
    if pad:
        kernels = jnp.pad(kernels, ((0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, hop=hop, hist=hist),
        grid=(z, nb),
        in_specs=[
            pl.BlockSpec(
                (z, seg_len), lambda zi, rb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rows_b, taps),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_b, hop),
            lambda zi, rb: (zi, rb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((z, nb * rows_b, hop), jnp.float32),
        scratch_shapes=[pltpu.VMEM((taps, hop), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * z * rows * taps * hop,
            bytes_accessed=z * (seg_len + rows * taps + rows * hop) * 4,
            transcendentals=0,
        ),
    )(segments, kernels)
    return out[:, :rows] if pad else out
