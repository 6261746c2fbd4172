"""The per-hop carry of the streaming engine.

One immutable pytree replaces the ~30 mutable instance arrays of the
reference (Python/apvast.py:95-151). Layout convention: batch axes lead
(path, mic, src, rank), the time axis is always last — contiguous lanes on
the VPU and natural matmul operands on the MXU.

Path axis order everywhere: 0 = A->A, 1 = A->B, 2 = B->A, 3 = B->B
(signal -> destination zone); a path's weighting zone is ``path % 2``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from apvast_tpu.config import ApVastConfig, GevdSolver


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ApVastState:
    # Streaming-convolution input histories, (2, fir_history): the FIR
    # equivalent of all the reference's lfilter delay-line states
    # (Python/apvast.py:114-120) — one vector per program signal.
    conv_history: jax.Array
    # Loudspeaker response blocks in TAIL form — the first
    # block_size - hop samples of the reference's full block
    # (Python/apvast.py:122-127); stage 1 appends the fresh hop and the
    # analysis contracts the pair against split DFT-matrix row slices,
    # so the reference's per-hop response-buffer slide is never
    # materialized (at 50% hop the carry is a rename of the fresh
    # chunk). Shape (4, mics, srcs, block_size - hop).
    resp: jax.Array
    # Target response blocks, tail form, (2, mics, block_size - hop)
    # (apvast.py:128-129).
    target_resp: jax.Array
    # WOLA overlap accumulators of the weighted responses, stored in
    # TAIL form — (..., block_size - hop) instead of the reference's
    # full block (apvast.py:131-137): the emitted head and shifted-in
    # zeros carry no state, and dropping them removes a full-buffer HBM
    # shift per hop (ops/wola.wola_overlap_add_tail; emits bit-identical
    # samples). Shapes: (4, mics, srcs, block-hop) / (2, mics, block-hop).
    wresp_overlap: jax.Array
    wtarget_overlap: jax.Array
    # Statistics buffers of weighted responses (apvast.py:139-145).
    # Under the PYTHON Toeplitz variant with hop > J, ``wresp_stat``
    # carries the sample-J-DELETED buffer, (4, mics, srcs, stat_len - 1)
    # — every statistics consumer needs that view and the deleted sample
    # slides out of the window before the next hop, so the slide and the
    # deletion collapse into one pass (engine/hop.py stage 4). Otherwise
    # (4, mics, srcs, stat_len) raw. ``wtarget_stat`` is always raw,
    # (2, mics, stat_len).
    wresp_stat: jax.Array
    wtarget_stat: jax.Array
    # Sliding input blocks, (2, block_size) (apvast.py:95-96).
    input_blocks: jax.Array
    # Output overlap accumulators, (2, num_eigenvectors, srcs,
    # block_size - hop), tail form (apvast.py:147-151).
    out_overlap: jax.Array
    # Target-output overlap accumulators, (2, srcs, block_size - hop). The
    # reference keeps one copy per rank but feeds every rank the same
    # spectra (apvast.py:467-496), so all copies stay identical; a single
    # buffer reproduces the outputs exactly.
    target_out_overlap: jax.Array
    # Carried GEVD subspace for the SUBSPACE solver, (2, jl, subspace_rank)
    # — warm-starts the next hop's iteration. None under the EIGH solver.
    gevd_q: jax.Array | None = None
    # Carried approximate inverse of the loaded dark matrix, (2, jl, jl)
    # — the Newton-Schulz whitening state (subspace_whiten='newton',
    # ops/jdiag.jdiag_topk_pencil_batched), or the carried inverse
    # Cholesky factor under subspace_whiten='tracking'. None otherwise.
    gevd_minv: jax.Array | None = None
    # Carried Ritz values (2, subspace_rank) and the hop counter driving
    # the preconditioner rebuild cadence — tracking whitening only.
    gevd_lam: jax.Array | None = None
    gevd_hop: jax.Array | None = None
    # Scalar relative Ritz residual from the previous hop (f32) — feeds
    # the residual-triggered rebuild fallback
    # (config.tracking_residual_rebuild). Tracking whitening only.
    gevd_resid: jax.Array | None = None


def init_state(
    config: ApVastConfig,
    key: jax.Array | None = None,
    response_noise: tuple[jax.Array, jax.Array] | None = None,
) -> ApVastState:
    """Fresh engine state.

    The reference seeds the six response buffers with unseeded
    ``1e-3 * randn`` "for numerical reasons" (Python/apvast.py:122-129).
    Here the noise comes from an explicit PRNG ``key`` (deterministic,
    checkpoint/resume-safe); pass ``key=None`` for zero init (the MATLAB
    behavior, apVast.m:175-180), or inject exact arrays via
    ``response_noise=(resp, target_resp)`` for parity fixtures.
    """
    dtype = jnp.dtype(config.dtype)
    m, s, v = config.num_mics, config.num_srcs, config.num_solutions
    block, n = config.block_size, config.statistics_buffer_length

    resp_shape = (4, m, s, block)
    tgt_shape = (2, m, block)
    if response_noise is not None:
        resp, target_resp = (
            jnp.asarray(response_noise[0], dtype=dtype),
            jnp.asarray(response_noise[1], dtype=dtype),
        )
        if resp.shape != resp_shape or target_resp.shape != tgt_shape:
            raise ValueError("response_noise shapes do not match config")
    elif key is not None:
        k1, k2 = jax.random.split(key)
        scale = config.noise_init_scale
        resp = scale * jax.random.normal(k1, resp_shape, dtype=dtype)
        target_resp = scale * jax.random.normal(k2, tgt_shape, dtype=dtype)
    else:
        resp = jnp.zeros(resp_shape, dtype=dtype)
        target_resp = jnp.zeros(tgt_shape, dtype=dtype)
    # Tail form: the head (first hop) of the injected/seeded full block
    # is dropped by the first slide before anything reads it, so keeping
    # only the tail is exact (same RNG draws as the full-block layout —
    # pinned-metric tests are unaffected).
    resp = resp[..., config.hop :]
    target_resp = target_resp[..., config.hop :]

    gevd_q = None
    gevd_minv = None
    gevd_lam = None
    gevd_hop = None
    gevd_resid = None
    if config.gevd_solver is GevdSolver.SUBSPACE:
        # Deterministic full-rank cold-start subspace; the per-hop QR
        # iterations orthonormalize and converge it during stream warmup.
        gevd_q = jax.random.normal(
            jax.random.key(7), (2, config.jl, config.subspace_rank), dtype=dtype
        )
        if config.subspace_whiten == "newton":
            # Identity is a deliberately bad inverse: hop 1's residual
            # check fails and takes the rebuild branch, seeding M from a
            # real factorization.
            gevd_minv = jnp.broadcast_to(
                jnp.eye(config.jl, dtype=dtype), (2, config.jl, config.jl)
            )
        elif config.subspace_whiten == "tracking":
            # Identity placeholder factor — hop 0 is inside the warmup
            # window, so the first hop always rebuilds from a real
            # factorization before the carry is ever used.
            li_dtype = jnp.bfloat16 if config.tracking_li_bf16 else dtype
            gevd_minv = jnp.broadcast_to(
                jnp.eye(config.jl, dtype=li_dtype),
                (2, config.jl, config.jl),
            )
            gevd_lam = jnp.zeros((2, config.subspace_rank), dtype=dtype)
            gevd_hop = jnp.zeros((), dtype=jnp.int32)
            # Cold residual 0: hop 0 sits in the warmup window anyway.
            gevd_resid = jnp.zeros((), dtype=jnp.float32)

    return ApVastState(
        conv_history=jnp.zeros((2, config.fir_history), dtype=dtype),
        resp=resp,
        target_resp=target_resp,
        wresp_overlap=jnp.zeros((4, m, s, block - config.hop), dtype=dtype),
        wtarget_overlap=jnp.zeros((2, m, block - config.hop), dtype=dtype),
        wresp_stat=jnp.zeros(
            (4, m, s, n - 1 if config.carried_deleted_statistics else n),
            dtype=dtype,
        ),
        wtarget_stat=jnp.zeros((2, m, n), dtype=dtype),
        input_blocks=jnp.zeros((2, block), dtype=dtype),
        out_overlap=jnp.zeros((2, v, s, block - config.hop), dtype=dtype),
        target_out_overlap=jnp.zeros((2, s, block - config.hop), dtype=dtype),
        gevd_q=gevd_q,
        gevd_minv=gevd_minv,
        gevd_lam=gevd_lam,
        gevd_hop=gevd_hop,
        gevd_resid=gevd_resid,
    )
