"""Per-zone banded circular convolution of response rows, in-VMEM.

The truncated-kernel perceptual weighting (ops/weighting_conv.py) is a
circular convolution of every (path, mic, src) response row with its
(zone, mic) weighting kernel. The XLA overlap-save formulation
materializes an O(4 M S (N + T)) frame tensor in HBM (~18 MB/hop,
measured >1 ms of slab streaming on the north-star scene). This kernel
keeps each (zone, mic)'s 2*S rows resident in VMEM, builds the
circularly-padded frame windows as row copies, and contracts them
against the prebuilt transposed banded Toeplitz (ops/weighting_conv.
_banded_toeplitz_t) on the MXU — frames never touch HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, k_ref, out_ref, xp, win, *, rows, n, taps, b):
    h = taps // 2
    f = n // b
    u = b + taps - 1

    # Circular halo: xp = [x[:, N-h:], x, x[:, :h]] (2-D block copies).
    xp[:, :h] = x_ref[0, 0, :, n - h :]
    xp[:, h : h + n] = x_ref[0, 0]
    xp[:, h + n :] = x_ref[0, 0, :, :h]

    for fi in range(f):
        win[:, :] = xp[:, fi * b : fi * b + u]
        out_ref[0, 0, :, fi * b : (fi + 1) * b] = jax.lax.dot_general(
            win[:],
            k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, B)


def rowwise_circular_conv_pallas(
    x: jax.Array,
    k_t: jax.Array,
    taps: int,
    block_b: int,
    interpret: bool = False,
) -> jax.Array:
    """Circular convolution of each response row with its zone's kernel.

    Args:
        x: (4, M, S, N) float32 rows in engine path order
            (path = 2*signal + zone).
        k_t: (2, M, B, B+T-1) float32 transposed banded Toeplitz
            (K^T[o, u] = c[o - u + T - 1]).
        taps: kernel length T (odd).
        block_b: frame size B (must divide N).

    Returns:
        (4, M, S, N) float32 convolved rows.
    """
    p4, m, s, n = x.shape
    if x.dtype != jnp.float32:
        raise ValueError("rowwise_circular_conv_pallas is float32-only")
    if n % block_b != 0:
        raise ValueError("block_b must divide the block size")
    u = block_b + taps - 1
    if k_t.shape != (2, m, block_b, u):
        raise ValueError(f"k_t shape {k_t.shape} != (2, {m}, {block_b}, {u})")
    rows = 2 * s
    # (zone, m, 2S rows, n): both signals' rows for one (zone, mic) are
    # contiguous, so every in-kernel op is 2-D (Mosaic layout safety).
    xz = (
        x.reshape(2, 2, m, s, n).transpose(1, 2, 0, 3, 4).reshape(2, m, rows, n)
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, n=n, taps=taps, b=block_b),
        grid=(2, m),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows, n),
                lambda zi, mi: (zi, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_b, u),
                lambda zi, mi: (zi, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, n),
            lambda zi, mi: (zi, mi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, m, rows, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, n + 2 * (taps // 2)), jnp.float32),
            pltpu.VMEM((rows, u), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m * rows * n * u,
            bytes_accessed=(2 * p4 * m * s * n + 2 * m * block_b * u) * 4,
            transcendentals=0,
        ),
    )(xz, k_t)
    return (
        out.reshape(2, m, 2, s, n).transpose(2, 0, 1, 3, 4).reshape(p4, m, s, n)
    )
