"""Fused framing + covariance + cross-correlation as one Pallas kernel.

The XLA statistics path materializes the frame tensor
(paths, mics, srcs, K, J) — ~100 MB at the reference scale — writes it to
HBM, re-reads it for the covariance einsum, and pays a gather for the
framing. This kernel never materializes frames in HBM: each (path, mic)
grid step DMAs one (srcs, N) buffer plane into VMEM, builds the full
(srcs*J, K) sliding-window matrix in scratch (statically unrolled row
shifts — Mosaic lowers constant-offset lane slices to vector shifts),
and runs ONE (SJ, K) x (K, SJ) contraction on the MXU, accumulating the
microphone sum in the resident (SJ, SJ) output tile. The same resident
windows also produce the cross-correlation vector r = Y d
(Python/apvast.py:340,356) as a second tiny contraction — no separate
FFT-correlation pass.

Semantics equal ``framing.frame_buffer`` + the covariance/cross einsums
in ``engine.hop`` (the deleted-sample PYTHON variant is handled by the
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


def _kernel(
    buf_ref, d_ref, out_ref, out_r_ref, windows, *, num_srcs, frame_length,
    num_frames, sym, pad_rows,
):
    s, j, k = num_srcs, frame_length, num_frames
    m = pl.program_id(1)

    # Row (sv*J + i) of the window matrix holds buffer plane row sv at
    # offsets [J-1-i : J-1-i+K] — forward time, most-recent-lag-first
    # (Python/apvast.py:336-338). Static offsets: Mosaic only supports
    # unaligned lane-dim slices with compile-time starts.
    for sv in range(s):
        for i in range(j):
            start = j - 1 - i
            windows[sv * j + i, :] = buf_ref[0, 0, sv, start : start + k]

    sj = s * j
    if pad_rows > sj:
        windows[sj:pad_rows, :] = jnp.zeros((pad_rows - sj, k), jnp.float32)
    if sym:
        # R is symmetric: contract only the block-lower-triangular tile
        # pairs and mirror the strict upper blocks by tile transposes.
        # 128-row blocks on the 128-padded window rows align exactly with
        # the MXU tile grid — a divisor-of-SJ blocking (e.g. 200-row
        # blocks at SJ=800) pads every tile pair to 256x256 and wastes
        # the FLOPs the symmetry saved. Products and accumulation order
        # match the full dot, so the kept triangle is numerically
        # identical.
        bs = 128
        nb = pad_rows // bs
        blocks = {}
        for bi in range(nb):
            wi = windows[bi * bs : (bi + 1) * bs, :]
            for bj in range(bi + 1):
                blocks[(bi, bj)] = jax.lax.dot_general(
                    wi,
                    windows[bj * bs : (bj + 1) * bs, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        # Mirror the strict upper blocks in-kernel (tile transposes are
        # cheap next to an XLA-side tril/transpose/select pass over the
        # full matrix).
        tile = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        blocks[(bi, bj)]
                        if bj <= bi
                        else jnp.swapaxes(blocks[(bj, bi)], 0, 1)
                        for bj in range(nb)
                    ],
                    axis=1,
                )
                for bi in range(nb)
            ],
            axis=0,
        )
    else:
        tile = jax.lax.dot_general(
            windows[0:sj, :],
            windows[0:sj, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # Cross-correlation against both zones' aligned targets (the engine
    # consumes path 0 with zone A's and path 3 with zone B's column).
    r_tile = jax.lax.dot_general(
        windows[:],
        d_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (s*j, 2)

    @pl.when(m == 0)
    def _():
        out_ref[0] = tile
        out_r_ref[0] = r_tile

    @pl.when(m > 0)
    def _():
        out_ref[0] = out_ref[0] + tile
        out_r_ref[0] = out_r_ref[0] + r_tile


def _panel_kernel(
    buf_ref, d_ref, out_ref, out_r_ref, windows, *, frame_length,
    num_frames, bs, panel,
):
    """Large-SJ variant: ONE row panel of R per call (rows
    [panel*bs, (panel+1)*bs) against all columns 0..(panel+1)*bs) — the
    block-lower-triangular part only; the caller assembles + mirrors.
    Grid (paths, mics), mic accumulation innermost, everything static
    (predicated per-pair dispatch measured as if all branches execute)."""
    j, k = frame_length, num_frames
    m = pl.program_id(1)
    rows_hi = (panel + 1) * bs

    # Fill window rows [0, (panel+1)*bs): static source row + lane offset.
    for r in range(rows_hi):
        sv = r // j
        start = j - 1 - (r % j)
        windows[r, :] = buf_ref[0, 0, sv, start : start + k]

    tile = jax.lax.dot_general(
        windows[panel * bs : rows_hi, :],
        windows[0:rows_hi, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, rows_hi)
    r_tile = jax.lax.dot_general(
        windows[panel * bs : rows_hi, :],
        d_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bs, 2)

    @pl.when(m == 0)
    def _():
        out_ref[0] = tile
        out_r_ref[0] = r_tile

    @pl.when(m > 0)
    def _():
        out_ref[0] = out_ref[0] + tile
        out_r_ref[0] = out_r_ref[0] + r_tile


def _packed_kernel(
    buf_ref, d_ref, out_ref, out_r_ref, windows, *, frame_length,
    num_frames, pairs, fill_rows, real_rows, want_r,
):
    """Large-SJ variant, 128-aligned symmetric tile pairs (VERDICT r2
    item 4): ONE window fill per (path, mic) grid step serves every
    block-lower-triangular 128x128 tile pair assigned to this call,
    accumulated over mics in a packed (npairs, 128, 128) resident
    output. Versus the row-panel kernel this removes the per-panel
    re-fill of the shared window rows (4000 -> 2560 rows per grid step
    at SJ=1600) and the per-panel re-DMA of the input buffer plane."""
    j, k = frame_length, num_frames
    m = pl.program_id(1)

    # Static source row + lane offset per window row (see _kernel).
    for r in range(min(fill_rows, real_rows)):
        sv = r // j
        start = j - 1 - (r % j)
        windows[r, :] = buf_ref[0, 0, sv, start : start + k]
    if fill_rows > real_rows:
        windows[real_rows:fill_rows, :] = jnp.zeros(
            (fill_rows - real_rows, k), jnp.float32
        )

    first = m == 0
    for idx, (bi, bj) in enumerate(pairs):
        tile = jax.lax.dot_general(
            windows[bi * 128 : (bi + 1) * 128, :],
            windows[bj * 128 : (bj + 1) * 128, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # where() instead of a pl.when pair per tile: the false branch
        # reads uninitialized VMEM on the first mic, but select discards
        # it (no NaN propagation into the kept lane).
        out_ref[0, idx] = jnp.where(
            first, tile, tile + out_ref[0, idx]
        )
    if want_r:
        r_tile = jax.lax.dot_general(
            windows[0:fill_rows, :],
            d_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_r_ref[0] = jnp.where(first, r_tile, r_tile + out_r_ref[0])


def _covariance_pallas_packed(
    buffers, targets, frame_length, interpret,
    vmem_budget=15 * 1024 * 1024,
):
    """Large-SJ covariance as packed 128-aligned symmetric tile pairs.

    Block rows are partitioned top-down into consecutive groups, each a
    pallas call whose VMEM footprint (window rows [0, group_hi*128) +
    its packed pair tiles, output counted double for pipelining copies)
    stays under ``vmem_budget``. Top-down maximizes the LAST group (the
    only one that must fill every window row), minimizing total fill
    work. Returns the same (r_mats, r_cross) as the resident path."""
    p, m, s, n = buffers.shape
    j = frame_length
    k = n - j + 1
    sj = s * j
    bs = 128
    nb = -(-sj // bs)
    pad_rows = nb * bs

    def group_cost(lo, hi):
        npairs = sum(bi + 1 for bi in range(lo, hi))
        return hi * bs * k * 4 + npairs * bs * bs * 4 * 2

    groups: list[tuple[int, int]] = []
    hi = nb
    while hi > 0:
        lo = hi - 1
        while lo > 0 and group_cost(lo - 1, hi) <= vmem_budget:
            lo -= 1
        if group_cost(lo, hi) > vmem_budget:
            raise NotImplementedError(
                f"covariance tile pair row ({bs} x {k} f32) group exceeds "
                "the VMEM budget; use the XLA statistics path"
            )
        groups.append((lo, hi))
        hi = lo
    groups.reverse()

    d_by_mic = targets.transpose(1, 0, 2)
    blocks: dict[tuple[int, int], jax.Array] = {}
    r_cross = None
    for lo, hi in groups:
        pairs = tuple((bi, bj) for bi in range(lo, hi) for bj in range(bi + 1))
        fill_rows = hi * bs
        want_r = hi == nb  # the full-fill group computes the cross term
        kernel = functools.partial(
            _packed_kernel, frame_length=j, num_frames=k, pairs=pairs,
            fill_rows=fill_rows, real_rows=min(sj, fill_rows), want_r=want_r,
        )
        out, out_r = pl.pallas_call(
            kernel,
            grid=(p, m),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, s, n),
                    lambda pi, mi: (pi, mi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, k),
                    lambda pi, mi: (mi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, len(pairs), bs, bs),
                    lambda pi, mi: (pi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, fill_rows, 2),
                    lambda pi, mi: (pi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((fill_rows, k), jnp.float32)],
            out_shape=(
                jax.ShapeDtypeStruct((p, len(pairs), bs, bs), jnp.float32),
                jax.ShapeDtypeStruct((p, fill_rows, 2), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * p * m * len(pairs) * bs * bs * k,
                bytes_accessed=p * m * s * n * 4
                + p * len(pairs) * bs * bs * 4,
                transcendentals=0,
            ),
        )(buffers, d_by_mic)
        for idx, pair in enumerate(pairs):
            blocks[pair] = out[:, idx]
        if want_r:
            r_cross = out_r[:, :sj]

    # Assemble the full symmetric matrix from the packed tile pairs.
    r_full = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    blocks[(bi, bj)]
                    if bj <= bi
                    else blocks[(bj, bi)].transpose(0, 2, 1)
                    for bj in range(nb)
                ],
                axis=2,
            )
            for bi in range(nb)
        ],
        axis=1,
    )
    return r_full[:, :sj, :sj], r_cross


def _covariance_pallas_panels(buffers, targets, frame_length, interpret, nb):
    """Large-SJ covariance: nb pallas calls, one block-row panel each.
    Returns the same (r_mats, r_cross) as the resident-tile path."""
    p, m, s, n = buffers.shape
    j = frame_length
    k = n - j + 1
    sj = s * j
    bs = sj // nb
    d_by_mic = targets.transpose(1, 0, 2)

    panels = []
    r_parts = []
    for panel in range(nb):
        rows_hi = (panel + 1) * bs
        kernel = functools.partial(
            _panel_kernel, frame_length=j, num_frames=k, bs=bs, panel=panel
        )
        tile, r_tile = pl.pallas_call(
            kernel,
            grid=(p, m),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, s, n),
                    lambda pi, mi: (pi, mi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, k),
                    lambda pi, mi: (mi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, bs, rows_hi),
                    lambda pi, mi: (pi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bs, 2),
                    lambda pi, mi: (pi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((rows_hi, k), jnp.float32)],
            out_shape=(
                jax.ShapeDtypeStruct((p, bs, rows_hi), jnp.float32),
                jax.ShapeDtypeStruct((p, bs, 2), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * p * m * bs * (rows_hi + 2) * k,
                bytes_accessed=p * m * s * n * 4 + p * bs * rows_hi * 4,
                transcendentals=0,
            ),
        )(buffers, d_by_mic)
        panels.append(tile)
        r_parts.append(r_tile)

    # Assemble the lower-triangular rows, mirror the strict upper part.
    low = jnp.concatenate(
        [
            jnp.pad(panels[i], ((0, 0), (0, 0), (0, sj - (i + 1) * bs)))
            for i in range(nb)
        ],
        axis=1,
    )  # (p, sj, sj), upper part zero
    low = jnp.tril(low)
    r_mats = low + jnp.triu(low.transpose(0, 2, 1), 1)
    r_cross = jnp.concatenate(r_parts, axis=1)  # (p, sj, 2)
    return r_mats, r_cross


def covariance_pallas(
    buffers: jax.Array,
    targets: jax.Array,
    frame_length: int,
    interpret: bool = False,
    sym_blocks: int = 8,
    large_sj: str = "packed",
):
    """R[p] = sum_m Y_pm Y_pm^T and r[p, :, z] = sum_m Y_pm d_zm.

    Args:
        buffers: (paths, mics, srcs, n) float32 statistics buffers
            (sample-deleted already for the PYTHON Toeplitz variant).
        targets: (2, mics, k) float32 aligned weighted-target windows
            (k = n - frame_length + 1).
        frame_length: J.
        sym_blocks: any value > 1 enables the symmetric (block-lower-
            triangular) contraction: window rows are zero-padded to a
            multiple of 128 and contracted in MXU-aligned 128-row tile
            pairs, the strict upper triangle mirrored afterwards —
            bit-identical results at ~57% of the full-GEMM MXU work.
            1 disables (full dot).
        large_sj: kernel used when the resident tile exceeds VMEM:
            "packed" (128-aligned symmetric tile pairs, one window fill
            per grid step) or "panels" (block-row panels, one call per
            panel — the round-2 variant, kept for A/B measurement).

    Returns:
        (r_mats, r_cross): (paths, srcs*J, srcs*J) covariance matrices in
        the engine's source-major row layout, and (paths, srcs*J, 2)
        cross-correlations against each zone's target (the engine uses
        [0, :, 0] and [3, :, 1]).
    """
    p, m, s, n = buffers.shape
    j = frame_length
    k = n - j + 1
    grid = (p, m)
    sj = s * j
    # The resident-tile path needs the full (SJ, SJ) output + (SJ, K)
    # windows in VMEM (double-buffered); beyond ~1000 rows that exceeds
    # the 16 MB budget — switch to the panel kernel (any nb dividing SJ
    # works; the fills are fully static).
    if sj * sj * 4 + sj * k * 4 > 8 * 1024 * 1024:
        if sj * k * 4 > 12 * 1024 * 1024:
            raise NotImplementedError(
                f"covariance windows ({sj} x {k} f32) exceed the VMEM "
                "budget even panel-split; reduce filter_length/sources "
                "or use the XLA statistics path"
            )
        if large_sj == "packed":
            return _covariance_pallas_packed(
                buffers, targets, frame_length, interpret
            )
        nb = next(
            d
            for d in range(2, sj + 1)
            if sj % d == 0
            and (sj // d) * sj * 4 * 2 <= 6 * 1024 * 1024
        )
        return _covariance_pallas_panels(
            buffers, targets, frame_length, interpret, nb
        )
    sym = sym_blocks > 1
    pad_rows = -(-sj // 128) * 128 if sym else sj

    buf_spec = pl.BlockSpec(
        (1, 1, s, n),
        lambda pi, mi: (pi, mi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # Targets rearranged (mics, 2, k) so the per-mic block has trailing
    # dims (2, k) == whole axes (Mosaic alignment rule).
    d_by_mic = targets.transpose(1, 0, 2)
    d_spec = pl.BlockSpec(
        (1, 2, k), lambda pi, mi: (mi, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, pad_rows, pad_rows),
        lambda pi, mi: (pi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_r_spec = pl.BlockSpec(
        (1, pad_rows, 2), lambda pi, mi: (pi, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel, num_srcs=s, frame_length=j, num_frames=k, sym=sym,
        pad_rows=pad_rows,
    )
    r_mats, r_cross = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[buf_spec, d_spec],
        out_specs=(out_spec, out_r_spec),
        out_shape=(
            jax.ShapeDtypeStruct((p, pad_rows, pad_rows), jnp.float32),
            jax.ShapeDtypeStruct((p, pad_rows, 2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((pad_rows, k), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * p * m * (s * j) * (s * j + 2) * k,
            bytes_accessed=p * m * s * n * 4 + p * (s * j) ** 2 * 4,
            transcendentals=0,
        ),
    )(buffers, d_by_mic)
    if pad_rows != sj:
        r_mats = r_mats[:, :sj, :sj]
        r_cross = r_cross[:, :sj]
    return r_mats, r_cross
