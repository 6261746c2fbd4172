"""Lag-table -> covariance assembly as a scanned MXU rank-C update.

The lag-statistics engine (ops/lag_statistics.py) has cheap correlation
math but an expensive finale: laying the diagonal tables out as the
(SJ, SJ) source-major matrices is pure data movement that XLA lowers as
wide misaligned relayouts (measured ~3.5 ms/hop at SJ=1600 — dwarfing
the correlations it assembles). This kernel removes the assembly as a
separate pass entirely, by fusing the edge-correction outer products,
their cumulative sum over the tap index, the full-window-correlation
broadcast, AND the Toeplitz layout into one scanned kernel built on two
observations (derivation in ops/lag_statistics.covariance_via_lags_skew):

1. A row band of the output at tap t1 needs
   ``R[(s1,t1),(s2,t2)] = c0[l] + sum_{i<=a} e[i, l]`` at
   ``a = J-1-t1, l = t1-t2`` — and written in OUTPUT coordinates
   (t2 lanes), stepping t1 -> t1-1 turns both the c0 term and the
   accumulated-e term into the SAME recursion:

       acc_{a}[s1, (s2,t2)] = acc_{a-1}[s1, (s2,t2+1)]    (1-lane shift)
                              + sum_c lhsT[a, s1, c] rhs[c, (s2,t2)]

   i.e. one MXU rank-C update plus a shift-by-one-lane per band. The
   lane that shifts in across each source's t2 = J-1 boundary is
   garbage, but it lands exactly in the strict-upper-tap region
   (t2 > t1) that the symmetry pass overwrites — garbage stays garbage.

2. The rank-C update's rhs operand ``rhs[c, (s2,t2)] = x2[c, J-1-t2, s2]``
   is INDEPENDENT of the band: one resident (C, S*J) matrix serves every
   step, so the whole assembly is J matmul slices against it.

Outputs are written band-by-band directly into the source-major row
blocks (s1, t1 fixed, all (s2, t2) lanes), so no post-kernel transpose
is needed — only the symmetric completion of the strict upper-tap
triangle (one plain 2-D transpose + select in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    lhs_ref, rhs_ref, c0_ref, out_ref, acc_ref, *, s1, j, bands, half_scaled
):
    b = pl.program_id(1)

    # One MXU pass for all bands of this step: (B*S1, C) @ (C, S2*J).
    terms = jax.lax.dot_general(
        lhs_ref[0],
        rhs_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )  # (bands*s1, s2*j)

    @pl.when(b == 0)
    def _():
        # Band a = 0 (t1 = J-1): acc = c0 in output coordinates. The
        # i = 0 edge row of lhsT is zeros by construction, so adding
        # terms[0:s1] keeps t_tab[0] = c0 exact.
        acc_ref[:] = c0_ref[0]

    if half_scaled:
        # Lane tap index t2 for the masked half-form write (see below).
        t2 = (
            jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) % j
        )

    for q in range(bands):
        # Band index a = b*bands + q; shift applies to every a >= 1.
        row = terms[q * s1 : (q + 1) * s1]
        if q == 0:
            # Shift belongs to a >= 1 only: at b == 0 acc was just
            # initialized for a = 0 (no shift).
            @pl.when(b != 0)
            def _():
                acc_ref[:] = _shift_left(acc_ref[:]) + row

            @pl.when(b == 0)
            def _():
                acc_ref[:] = acc_ref[:] + row
        else:
            acc_ref[:] = _shift_left(acc_ref[:]) + row
        # Output row band t1 = J-1-a sits at block-local index
        # bands-1-q (the step's t1 range is [J-(b+1)B, J-1-bB]).
        if half_scaled:
            # HALF form: zero the garbage strict-upper-tap lanes and
            # halve the tap-diagonal lanes so the full symmetric matrix
            # is exactly M + M^T — no post-kernel mask/select/transpose
            # pass (the completion cost ~215 MB/hop of HBM traffic at
            # SJ=1600; consumers apply M and M^T instead).
            a_idx = b * bands + q
            t1 = j - 1 - a_idx
            fac = jnp.where(
                t2 > t1,
                jnp.zeros((), acc_ref.dtype),
                jnp.where(
                    t2 == t1,
                    jnp.full((), 0.5, acc_ref.dtype),
                    jnp.ones((), acc_ref.dtype),
                ),
            )
            out_ref[0, bands - 1 - q, :, :] = acc_ref[:] * fac
        else:
            out_ref[0, bands - 1 - q, :, :] = acc_ref[:]


def _shift_left(x: jax.Array) -> jax.Array:
    """acc[t2] <- acc[t2+1] on the lane axis; the wrapped lane lands in
    the garbage (strict upper-tap) region — see module docstring."""
    return jnp.roll(x, -1, axis=1)


def lag_skew_assemble(
    lhs_t: jax.Array,
    rhs_sm: jax.Array,
    c0_sm: jax.Array,
    j: int,
    bands_per_step: int | None = None,
    interpret: bool = False,
    half_scaled: bool = False,
) -> jax.Array:
    """Assemble source-major lower-tap-triangle covariance rows.

    With ``half_scaled`` the written rows are exactly the half form M
    (R = M + M^T): garbage strict-upper-tap lanes are zeroed and
    tap-diagonal lanes halved at write time (one VPU select per band).

    Args:
        lhs_t: (P, J*S1, C) — lhs_t[p, a*S1+s1, c] = edge factor
            x1[c][a] for source s1 (row a = 0 all-zero).
        rhs_sm: (P, C, S2*J) — rhs_sm[p, c, s2*J+t2] = x2[c][J-1-t2]
            for source s2.
        c0_sm: (P, S1, S2*J) — c0_sm[p, s1, s2*J+t2] =
            C0[p, s1, s2, J-1-t2].
        j: filter length J (number of tap bands).
        bands_per_step: grid-step batch of bands (must divide J);
            auto-picked when None.

    Returns:
        (P, S1, J, S2*J) float32: row band [p, s1, t1, :] is the
        source-major covariance row (s1, t1) — valid at lanes with
        t2 <= t1, garbage above (callers complete by symmetry).
    """
    p, js1, c = lhs_t.shape
    s1 = js1 // j
    w = rhs_sm.shape[-1]
    dtype = lhs_t.dtype
    if bands_per_step is None:
        bands_per_step = next(
            (b for b in (10, 8, 5, 4, 2) if j % b == 0), 1
        )
    if j % bands_per_step:
        raise ValueError(f"bands_per_step must divide J={j}")
    if not interpret and (s1 % 8 or (bands_per_step * s1) % 8):
        raise ValueError(
            "skew assembly needs the source count to be a multiple of 8 "
            f"(got {s1}) — Mosaic block sublane alignment; use the wide "
            "lag assembly for other geometries"
        )
    nb = j // bands_per_step

    # Mosaic requires the last two dims of every block shape to be
    # (8, 128)-aligned. Zero-pad the contraction axis c (lhs lanes, rhs
    # sublanes; zero columns contract to zero) and the output lane axis
    # w (rhs/c0 lanes). Pad-lane garbage from the in-kernel roll
    # propagates leftward ONE lane per band, so at band a it occupies
    # lanes >= w_pad - a, i.e. taps t2 >= j - a + (w_pad - w)
    # > j - 1 - a = t1 — always inside the strict-upper-tap region the
    # symmetric completion overwrites, for every J and pad width.
    c_pad = -(-c // 128) * 128
    w_pad = -(-w // 128) * 128
    if c_pad != c:
        lhs_t = jnp.pad(lhs_t, ((0, 0), (0, 0), (0, c_pad - c)))
        rhs_sm = jnp.pad(rhs_sm, ((0, 0), (0, c_pad - c), (0, 0)))
    if w_pad != w:
        rhs_sm = jnp.pad(rhs_sm, ((0, 0), (0, 0), (0, w_pad - w)))
        c0_sm = jnp.pad(c0_sm, ((0, 0), (0, 0), (0, w_pad - w)))

    # Output laid out (p, j, s1, w_pad) so the block's last two dims are
    # the aligned (s1, w_pad); the caller-facing (p, s1, j, w) view is
    # one cheap row-contiguous transpose away.
    out = pl.pallas_call(
        functools.partial(
            _kernel, s1=s1, j=j, bands=bands_per_step,
            half_scaled=half_scaled,
        ),
        grid=(p, nb),
        in_specs=[
            pl.BlockSpec(
                (1, bands_per_step * s1, c_pad),
                lambda pi, b: (pi, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_pad, w_pad),
                lambda pi, b: (pi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s1, w_pad),
                lambda pi, b: (pi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bands_per_step, s1, w_pad),
            lambda pi, b: (pi, nb - 1 - b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((p, j, s1, w_pad), dtype),
        scratch_shapes=[pltpu.VMEM((s1, w_pad), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * p * js1 * c_pad * w_pad,
            bytes_accessed=(
                p * (js1 * c_pad + c_pad * w_pad + s1 * w_pad + s1 * j * w_pad)
            )
            * 4,
            transcendentals=0,
        ),
    )(lhs_t, rhs_sm, c0_sm)
    return out[..., :w].transpose(0, 2, 1, 3)
