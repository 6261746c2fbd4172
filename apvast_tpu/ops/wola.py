"""Weighted overlap-add (WOLA) filterbank primitives.

The reference interleaves windowing, rfft, spectral weighting, irfft and
overlap-add inline per microphone (Python/apvast.py:197-311,
Matlab/ControlMethods/apVast.m:288-384). Here they are three small pure
functions batched over arbitrary leading axes; the time axis is always the
last axis so XLA lays blocks out contiguously on the VPU lanes.

With the sine window (Python/apvast.py:94) and 50% hop, analysis-window *
synthesis-window sums to 1 (sin^2 + cos^2), giving perfect reconstruction;
this is property-tested in tests/test_wola.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# The TPU runtime used here rejects very large flattened FFT batches
# (empirically, irfft with >= ~800 rows fails); all batched FFTs go
# through the chunked helpers below, which split the leading batch into
# slabs of at most this many rows. Chunking is free for XLA (static
# slices, fused) and keeps single-scene graphs inside the limit.
_FFT_MAX_ROWS = 256


def _batched_fft(fn, spectra: jax.Array) -> jax.Array:
    lead = math.prod(spectra.shape[:-1])
    if lead <= _FFT_MAX_ROWS:
        return fn(spectra)
    flat = spectra.reshape(lead, spectra.shape[-1])
    parts = [
        fn(flat[i : i + _FFT_MAX_ROWS]) for i in range(0, lead, _FFT_MAX_ROWS)
    ]
    out = jnp.concatenate(parts, axis=0)
    return out.reshape(*spectra.shape[:-1], out.shape[-1])


def rfft_batched(blocks: jax.Array, n: int) -> jax.Array:
    """Batch-size-safe one-sided FFT along the last axis."""
    return _batched_fft(lambda x: jnp.fft.rfft(x, n=n, axis=-1), blocks)


def irfft_batched(spectra: jax.Array, n: int) -> jax.Array:
    """Batch-size-safe one-sided inverse FFT along the last axis."""
    return _batched_fft(lambda x: jnp.fft.irfft(x, n=n, axis=-1), spectra)


def sine_window(block_size: int, dtype=jnp.float64) -> jax.Array:
    """The WOLA window ``sin(pi * n / N)`` (Python/apvast.py:94)."""
    n = jnp.arange(block_size, dtype=dtype)
    return jnp.sin(jnp.pi / block_size * n)


def wola_analyze(window: jax.Array, blocks: jax.Array) -> jax.Array:
    """Window + one-sided FFT. ``blocks``: (..., block_size)."""
    return rfft_batched(window * blocks, blocks.shape[-1])


def wola_synthesize(
    window: jax.Array, spectra: jax.Array, block_size: int
) -> jax.Array:
    """One-sided inverse FFT + synthesis window. ``spectra``: (..., bins)."""
    return window * irfft_batched(spectra, block_size)


def wola_overlap_add(
    overlap: jax.Array, new_block: jax.Array, hop: int
):
    """Shift the overlap buffer by ``hop`` and accumulate a synthesized block.

    Mirrors the reference update ``[old[hop:]; zeros(hop)] + new``
    (Python/apvast.py:218, apVast.m:315-317). Returns ``(buffer, emitted)``
    where ``emitted`` is the first ``hop`` samples of the updated buffer —
    the completed WOLA output for this hop.
    """
    shifted = jnp.concatenate(
        [overlap[..., hop:], jnp.zeros_like(overlap[..., :hop])], axis=-1
    )
    buffer = shifted + new_block
    return buffer, buffer[..., :hop]


def wola_overlap_add_tail(
    tail: jax.Array, new_block: jax.Array, hop: int
):
    """Overlap-add with the carry reduced to the (block - hop)-sample
    TAIL of the reference's full-block buffer.

    The reference update (Python/apvast.py:218) shifts a block-length
    accumulator every hop; but its first ``hop`` samples are emitted
    immediately and its shifted-in zeros carry no information, so only
    ``block - hop`` samples of true state exist. Keeping just that tail
    removes a full-buffer HBM shift per hop per accumulator (~17 MB/hop
    of traffic on the north-star scene across the four accumulators; at
    the production 50% hop the new tail is simply ``new_block[hop:]``).

    Emitted samples are BIT-IDENTICAL to :func:`wola_overlap_add`: the
    same adds in the same order, minus the dead shift.

    Returns ``(new_tail, emitted)`` with ``emitted`` of ``hop`` samples.
    """
    bh = tail.shape[-1]
    if hop >= bh:
        # hop >= block/2 (50% overlap or less): nothing old survives
        # past the emit.
        pad = [(0, 0)] * (tail.ndim - 1) + [(0, hop - bh)]
        emit = new_block[..., :hop] + jnp.pad(tail, pad)
        return new_block[..., hop:], emit
    emit = tail[..., :hop] + new_block[..., :hop]
    shifted = jnp.concatenate(
        [tail[..., hop:], jnp.zeros_like(tail[..., :hop])], axis=-1
    )
    return shifted + new_block[..., hop:], emit


def slide(buffer: jax.Array, fresh: jax.Array) -> jax.Array:
    """Append ``fresh`` samples to a sliding time buffer, dropping the
    oldest (the reference's ``concat(buf[idx], new)`` pattern,
    Python/apvast.py:173,230-235). When ``fresh`` is longer than the
    buffer (hop > statistics window) the result is the most recent
    ``len(buffer)`` samples — the window length is ALWAYS preserved
    (the naive concat would silently grow the carried buffer to hop
    length, breaking lax.scan's carry contract; code-review r3)."""
    n = fresh.shape[-1]
    if n >= buffer.shape[-1]:
        return fresh[..., n - buffer.shape[-1] :]
    return jnp.concatenate([buffer[..., n:], fresh], axis=-1)


def slide_tail(tail: jax.Array, fresh: jax.Array, hop: int) -> jax.Array:
    """Advance a TAIL-form sliding block: ``tail`` holds the first
    ``block - hop`` samples of the conceptual block, ``fresh`` the
    final ``hop``; returns the next tail (the conceptual full block
    shifted by ``hop``, head dropped). At the production 50% hop this
    is a pure rename of ``fresh`` — no copy at all."""
    l = tail.shape[-1]
    if hop >= l:
        return fresh[..., hop - l :]
    return jnp.concatenate([tail[..., hop:], fresh], axis=-1)
