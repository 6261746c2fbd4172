"""Offline (non-adaptive, non-perceptual) VAST — the "VAST 2018" baseline.

Reference: Matlab/ControlMethods/vast.m. With mu = 1 the span endpoints of
this one kernel reproduce the classic baselines (vast.m:26-31 /
apVast.m:113-122): ``num_eigenvectors = 1`` is BACC and
``num_eigenvectors = filter_length * num_srcs`` is pressure matching.

The reference excites the room with a unit impulse and accumulates the
statistics through an explicit sliding convolution matrix over 1000 time
steps (vast.m:50-74). Algebraically the accumulated data vectors are just
lagged reads of the RIRs themselves:

    y_{n,m}[s*J + r] = g[m, n - r, s]   (zero outside the RIR support)

so the TPU form frames the zero-padded RIRs once (a static gather) and
contracts the (mics, JL, steps) tensor on the MXU — no time loop, no
Toeplitz. The ``num_steps`` truncation of the reference (vast.m:50, which
clips correlation lags when ``num_steps < rir_length + J - 1``) is
reproduced exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apvast_tpu.ops.jdiag import jdiag
from apvast_tpu.ops.synthesis import (
    variable_span_filters,
    variable_span_filters_mu_grid,
)


def _lagged_rir_frames(
    rir: jax.Array, filter_length: int, num_steps: int
) -> jax.Array:
    """Frame RIRs into the offline data tensor.

    Args:
        rir: (rir_length, srcs, mics) — framework RIR layout (the
            reference uses (mics, rir_length, srcs), vast.m:10-17).

    Returns:
        y: (mics, srcs * J, num_steps) with y[m, s*J + r, n] = rir[n - r, s, m].
    """
    j = filter_length
    rl, s, m = rir.shape
    # Time-last layout, front-padded by J-1 (for negative lags) and
    # back-padded so every step index n <= num_steps - 1 is in range.
    g = rir.transpose(2, 1, 0)  # (m, s, rl)
    back = max(0, num_steps - rl - (j - 1)) + j
    g = jnp.pad(g, ((0, 0), (0, 0), (j - 1, back)))
    idx = (j - 1) + jnp.arange(num_steps)[None, :] - jnp.arange(j)[:, None]
    frames = g[:, :, idx]  # (m, s, j, n)
    return frames.reshape(m, s * j, num_steps)


def vast_statistics(
    rir_bright: jax.Array,
    rir_dark: jax.Array,
    filter_length: int,
    modeling_delay: int,
    reference_index: int,
    num_steps: int = 1000,
):
    """(R_bright, R_dark, r_bright) of the offline design (vast.m:46-77),
    normalized by ``mics * (rir_length - filter_length)`` as the reference
    does (vast.m:75-77)."""
    rl, s, m = rir_bright.shape
    dtype = rir_bright.dtype
    yb = _lagged_rir_frames(rir_bright, filter_length, num_steps)
    yd = _lagged_rir_frames(rir_dark, filter_length, num_steps)
    # Target sequence d[m, n] = delayed reference-speaker bright RIR
    # (vast.m:61: d(1) of the modeling-delayed response, which the
    # reference truncates to the RIR length — nonzero only for
    # modeling_delay <= n < rir_length).
    ref = rir_bright[:, reference_index, :].T  # (m, rl)
    d = jnp.zeros((m, num_steps), dtype=dtype)
    span = max(0, min(num_steps, rl) - modeling_delay)
    d = d.at[:, modeling_delay : modeling_delay + span].set(ref[:, :span])

    rb = jnp.einsum("man,mbn->ab", yb, yb, preferred_element_type=dtype)
    rd = jnp.einsum("man,mbn->ab", yd, yd, preferred_element_type=dtype)
    rvec = jnp.einsum("man,mn->a", yb, d, preferred_element_type=dtype)
    scale = 1.0 / (m * (rl - filter_length))
    return rb * scale, rd * scale, rvec * scale


def vast_offline(
    rir_bright: jax.Array,
    rir_dark: jax.Array,
    filter_length: int,
    modeling_delay: int,
    reference_index: int,
    num_eigenvectors: int,
    mu: float,
    num_steps: int = 1000,
    reg: float = 0.0,
    return_family: bool = False,
):
    """One-shot VAST design from RIRs alone (vast.m:1-98).

    Returns the FIR filters (filter_length, num_srcs); with
    ``return_family=True`` returns all spans (V, filter_length, num_srcs).
    """
    rb, rd, rvec = vast_statistics(
        rir_bright, rir_dark, filter_length, modeling_delay,
        reference_index, num_steps,
    )
    u, lam = jdiag(rb, rd, reg)
    family = variable_span_filters(u, lam, rvec, mu, num_eigenvectors)
    s = rir_bright.shape[1]
    # (V, JL) -> (V, J, S): source-major layout transposed to the
    # reference's (filter_length, num_srcs) output (vast.m:98).
    family = family.reshape(num_eigenvectors, s, filter_length).transpose(0, 2, 1)
    return family if return_family else family[-1]


def acc(
    rir_bright: jax.Array,
    rir_dark: jax.Array,
    filter_length: int,
    modeling_delay: int,
    reference_index: int,
    num_steps: int = 1000,
    reg: float = 0.0,
):
    """The BACC (brightness-/acoustic-contrast-control) endpoint: rank-1
    span with mu = 1 (vast.m:26-31, apVast.m:113-122)."""
    return vast_offline(
        rir_bright, rir_dark, filter_length, modeling_delay,
        reference_index, num_eigenvectors=1, mu=1.0,
        num_steps=num_steps, reg=reg,
    )


def pressure_matching(
    rir_bright: jax.Array,
    rir_dark: jax.Array,
    filter_length: int,
    modeling_delay: int,
    reference_index: int,
    num_steps: int = 1000,
    reg: float = 0.0,
):
    """The pressure-matching endpoint: full-rank span with mu = 1
    (vast.m:26-31, apVast.m:113-122)."""
    full_rank = filter_length * rir_bright.shape[1]
    return vast_offline(
        rir_bright, rir_dark, filter_length, modeling_delay,
        reference_index, num_eigenvectors=full_rank, mu=1.0,
        num_steps=num_steps, reg=reg,
    )


def vast_offline_sweep(
    rir_bright: jax.Array,
    rir_dark: jax.Array,
    filter_length: int,
    modeling_delay: int,
    reference_index: int,
    num_eigenvectors: int,
    mu_grid: jax.Array,
    num_steps: int = 1000,
    reg: float = 0.0,
):
    """Full (mu x span-rank) design surface from one GEVD.

    The TPU-scale hyperparameter sweep (BASELINE.json config 5): returns
    (len(mu_grid), V, filter_length, num_srcs) — every mu and every span
    rank at once; the ACC endpoint is [:, 0] with mu = 1, pressure
    matching is [:, -1] at full rank.
    """
    rb, rd, rvec = vast_statistics(
        rir_bright, rir_dark, filter_length, modeling_delay,
        reference_index, num_steps,
    )
    u, lam = jdiag(rb, rd, reg)
    surface = variable_span_filters_mu_grid(
        u, lam, rvec, jnp.asarray(mu_grid, dtype=rvec.dtype), num_eigenvectors
    )
    s = rir_bright.shape[1]
    return surface.reshape(
        len(mu_grid), num_eigenvectors, s, filter_length
    ).transpose(0, 1, 3, 2)
