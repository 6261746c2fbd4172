"""Windowed lag correlations as an in-VMEM shift-stack matmul.

The lag-statistics engine (ops/lag_statistics.py) needs
``C0[p, s1, s2, l] = sum_{m, t<K} x[p,m,s1,t] x[p,m,s2,t+l]`` — the
correlation of every source pair at J lags over the K-sample window.
Expressed as a matmul the RHS is a shift stack Z[(s2,l), t] = x2[s2, t+l]
whose HBM materialization is O(S J K) per (path, mic) (~200 MB on the
north-star scene); XLA's grouped-conv lowering avoids that but measured
~520 us/hop. This kernel builds Z in VMEM per (path, mic) grid step
(S*J row copies of the resident source block — the streaming_conv
windows pattern) and contracts on the MXU, accumulating the mic sum in
the revisited output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, out_ref, z_scratch, *, s, j, k):
    mi = pl.program_id(1)

    # The step is VMEM-bandwidth-bound on the shift-stack traffic
    # (build + matmul read ~6.5 MB/step at north-star scale = the
    # measured 162 us/hop), so the stack is stored in bf16: the MXU
    # evaluates f32 matmuls as bf16-input/f32-accumulate anyway
    # (PERF.md), making the rounding identical and the traffic half.
    x_b = x_ref[0, 0].astype(z_scratch.dtype)

    # Shift stack in l-major row order: Z[(l, s2), t] = x[s2, t + l] —
    # J two-dimensional block copies (an (s2, l) row-by-row build is
    # S*J copies whose unaligned lane shifts blow up Mosaic compile
    # time at production sizes).
    for l in range(j):
        z_scratch[l * s : (l + 1) * s, :] = x_b[:, l : l + k]

    # (S, K) @ (K, J*S)^T on the MXU; mic sum accumulates in the
    # revisited output block (grid iterates mics fastest).
    c = jax.lax.dot_general(
        x_b[:, :k],
        z_scratch[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (s1, j*s2)

    @pl.when(mi == 0)
    def _():
        out_ref[0] = c

    @pl.when(mi != 0)
    def _():
        out_ref[0] += c


def lag_corr_pallas(
    x: jax.Array,
    j: int,
    interpret: bool = False,
    stack_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Mic-summed source-pair correlations at J lags.

    Args:
        x: (4, M, S, N) float32 statistics buffers.
        j: lag count J (= filter length); K = N - J + 1.

    Returns:
        (4, S, S, J) float32: C0[p, s1, s2, l].
    """
    p4, m, s, n = x.shape
    k = n - j + 1
    if x.dtype != jnp.float32:
        raise ValueError("lag_corr_pallas is a float32 production kernel")
    # bf16 stack on TPU (identical MXU rounding, half the VMEM traffic);
    # f32 in interpret mode, where a bf16 stack would be a REAL precision
    # loss (CPU matmuls do not accumulate bf16 inputs in f32 the way the
    # MXU does, and the CPU path is the reference the tests pin).
    if stack_dtype is None:
        stack_dtype = jnp.float32 if interpret else jnp.bfloat16
    z_dtype = stack_dtype
    out = pl.pallas_call(
        functools.partial(_kernel, s=s, j=j, k=k),
        grid=(p4, m),
        in_specs=[
            pl.BlockSpec(
                (1, 1, s, n),
                lambda pi, mi: (pi, mi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s, s * j), lambda pi, mi: (pi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((p4, s, s * j), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s * j, k), z_dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * p4 * m * s * s * j * k,
            bytes_accessed=(p4 * m * s * n + p4 * s * s * j) * 4,
            transcendentals=0,
        ),
    )(x)
    # Columns are l-major: (p, s1, J, s2) -> (p, s1, s2, J).
    return out.reshape(p4, s, j, s).transpose(0, 1, 3, 2)
