"""Output synthesis as a circular-convolution matmul kernel.

The reference synthesizes loudspeaker feeds by multiplying the input
spectrum with each rank's filter spectrum and inverse-transforming
(Python/apvast.py:445-504) — at V ranks x S loudspeakers that is ~2VS
length-N FFTs per hop, and FFTs run on the TPU's VPU, not the MXU. But
the filters are only J taps long, so the circular convolution is exactly
one (V*S, J) x (J, N) matmul against the input's sliding circular
windows: this kernel builds the J window rows in VMEM (static-offset
slices -> vector shifts) and runs the whole rank family through the MXU
in one contraction per zone. Numerically identical to the FFT path up to
roundoff (tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ext_ref, filt_ref, out_ref, windows, *, taps, block):
    zi = pl.program_id(0)
    # Window row t holds extended_input[J-1-t : J-1-t+N], i.e.
    # x[(n - t) mod N] along n — so out = W @ windows is the circular
    # convolution of the input block with each J-tap filter row.
    # (Refilled per row block — J rows, negligible next to the matmul.)
    for t in range(taps):
        start = taps - 1 - t
        windows[t, :] = ext_ref[zi, start : start + block]
    out_ref[0] = jax.lax.dot_general(
        filt_ref[0],
        windows[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fused_kernel(
    ext_ref, filt_ref, win_ref, tail_ref, emit_ref, new_tail_ref, windows,
    *, taps, block, hop
):
    zi = pl.program_id(0)
    for t in range(taps):
        start = taps - 1 - t
        windows[t, :] = ext_ref[zi, start : start + block]
    y = jax.lax.dot_general(
        filt_ref[0],
        windows[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * win_ref[...]  # synthesis window, broadcast over rows
    bh = block - hop
    if hop >= bh:
        # 50% hop (production): emit = y[:hop] + tail (zero-padded when
        # hop > bh), next tail = y[hop:].
        t = tail_ref[0]
        if hop > bh:
            t = jnp.pad(t, ((0, 0), (0, hop - bh)))
        emit_ref[0] = y[:, :hop] + t
        new_tail_ref[0] = y[:, hop:]
    else:
        emit_ref[0] = y[:, :hop] + tail_ref[0, :, :hop]
        new_tail_ref[0] = (
            jnp.pad(tail_ref[0, :, hop:], ((0, 0), (0, hop))) + y[:, hop:]
        )


def circular_filter_overlap_pallas(
    windowed_input: jax.Array,
    filters: jax.Array,
    window: jax.Array,
    tail: jax.Array,
    hop: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """:func:`circular_filter_pallas` with the synthesis window and the
    tail-form overlap-add (ops/wola.wola_overlap_add_tail) fused into the
    kernel epilogue: the full (rows, block) synthesis tile never round
    trips through HBM — only the emitted hop and the carried tail are
    written (saves ~20 MB/hop on the north-star scene).

    Args:
        windowed_input: (zones, block) analysis-windowed input blocks.
        filters: (zones, rows, taps) float32 filter rows.
        window: (block,) synthesis window.
        tail: (zones, rows, block - hop) overlap tails.
        hop: emit length.

    Returns:
        (emit (zones, rows, hop), new_tail (zones, rows, block - hop)) —
        numerically identical to the unfused window + overlap-add chain.
    """
    z, block = windowed_input.shape
    _, rows, taps = filters.shape
    bh = block - hop
    ext = jnp.concatenate(
        [windowed_input[:, block - (taps - 1) :], windowed_input], axis=-1
    )
    if rows * block * 4 * 2 <= 11 * 1024 * 1024:
        rows_b = rows
    else:
        rows_b = min(512, -(-rows // 8) * 8)
    nb = -(-rows // rows_b)
    pad = nb * rows_b - rows
    if pad:
        filters = jnp.pad(filters, ((0, 0), (0, pad), (0, 0)))
        tail = jnp.pad(tail, ((0, 0), (0, pad), (0, 0)))

    emit, new_tail = pl.pallas_call(
        functools.partial(_fused_kernel, taps=taps, block=block, hop=hop),
        grid=(z, nb),
        in_specs=[
            pl.BlockSpec(
                (z, block + taps - 1),
                lambda zi, rb: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_b, taps),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block), lambda zi, rb: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rows_b, bh),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, rows_b, hop),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_b, bh),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((z, nb * rows_b, hop), jnp.float32),
            jax.ShapeDtypeStruct((z, nb * rows_b, bh), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((taps, block), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * z * rows * taps * block,
            bytes_accessed=z * (block + rows * taps + rows * block) * 4,
            transcendentals=0,
        ),
    )(ext, filters, window.reshape(1, block).astype(jnp.float32), tail)
    if pad:
        emit, new_tail = emit[:, :rows], new_tail[:, :rows]
    return emit, new_tail


def circular_filter_pallas(
    windowed_input: jax.Array,
    filters: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Circular convolution of input blocks with J-tap filter banks.

    Args:
        windowed_input: (zones, block) — the analysis-windowed input
            blocks (the engine's ``window * input_block``).
        filters: (zones, rows, taps) float32 — flattened (rank, src)
            filter rows.

    Returns:
        (zones, rows, block): per-row circular convolution, equal to
        ``irfft(rfft(windowed_input) * rfft(filters, n=block))``.
    """
    z, block = windowed_input.shape
    _, rows, taps = filters.shape
    # Circular pre-extension so every window is a contiguous slice.
    ext = jnp.concatenate(
        [windowed_input[:, block - (taps - 1) :], windowed_input], axis=-1
    )  # (z, block + taps - 1)

    # Row blocks keep the resident output tile bounded (a 32-speaker
    # scene's full (1600, 1600) tile would blow the VMEM budget); rows
    # padded up with zero filter rows and sliced off the output.
    if rows * block * 4 * 2 <= 11 * 1024 * 1024:
        rows_b = rows  # single resident tile (double-buffered) fits
    else:
        rows_b = min(512, -(-rows // 8) * 8)
    nb = -(-rows // rows_b)
    pad = nb * rows_b - rows
    if pad:
        filters = jnp.pad(filters, ((0, 0), (0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, block=block),
        grid=(z, nb),
        in_specs=[
            # Whole-array blocks (Mosaic's trailing-dim alignment rule);
            # the zone row is selected inside the kernel via program_id.
            pl.BlockSpec(
                (z, block + taps - 1),
                lambda zi, rb: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_b, taps),
                lambda zi, rb: (zi, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_b, block),
            lambda zi, rb: (zi, rb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((z, nb * rows_b, block), jnp.float32),
        scratch_shapes=[pltpu.VMEM((taps, block), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * z * rows * taps * block,
            bytes_accessed=z * (block + rows * taps + rows * block) * 4,
            transcendentals=0,
        ),
    )(ext, filters)
    return out[:, :rows] if pad else out
