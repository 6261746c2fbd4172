"""The per-hop transition — the entire reference hot path as one pure jit.

Mirrors ``process_input_buffers`` (Python/apvast.py:153-165 /
Matlab/ControlMethods/apVast.m:221-245) stage for stage, with every
per-mic / per-src Python loop of the reference turned into a batch axis:

1. streaming RIR convolution  (ref: 306 lfilter calls  -> 1 batched FFT)
2. weighted target update     (ref: per-mic rfft loops -> batched WOLA)
3. weighted response update   (ref: per-mic rfft loops -> batched WOLA)
4. statistics                 (ref: Toeplitz + GEMM    -> frames + einsum)
5. GEVD + filter synthesis    (ref: schur per zone     -> vmapped eigh,
                               rank loop -> cumulative sum)
6. input block slide
7. output synthesis           (ref: per-rank loop      -> rank batch)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from apvast_tpu.config import (
    ApVastConfig,
    GevdSolver,
    RegularizationVariant,
    TargetFilterVariant,
    ToeplitzVariant,
)
from apvast_tpu.engine.plan import ApVastPlan
from apvast_tpu.engine.state import ApVastState
from apvast_tpu.ops.framing import frame_buffer
from apvast_tpu.ops.jdiag import jdiag_batched, jdiag_topk_batched
from apvast_tpu.ops.synthesis import variable_span_filters
from apvast_tpu.ops.wola import (
    irfft_batched,
    rfft_batched,
    slide,
    slide_tail,
    wola_analyze,
    wola_overlap_add_tail,
    wola_synthesize,
)
from apvast_tpu.perceptual.model import perceptual_gain

# Path axis: 0=A->A, 1=A->B, 2=B->A, 3=B->B.
_PATH_SIGNAL = (0, 0, 1, 1)  # which program signal drives the path
_PATH_RIR = (0, 1, 0, 1)  # which zone's RIR set the path goes through
_PATH_ZONE = (0, 1, 0, 1)  # destination zone == weighting zone


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HopOutputs:
    """Per-hop loudspeaker feeds, each (num_eigenvectors, hop, srcs) —
    the all-ranks output contract of the Python reference
    (apvast.py:499-506). ``out_a``/``out_b`` are None for a disabled zone,
    as in the reference (apvast.py:433-443)."""

    out_a: jax.Array | None
    out_b: jax.Array | None
    # Target outputs are (hop, srcs) — ONE copy. The reference emits V
    # identical copies (apvast.py:501-504); the model wrappers broadcast
    # at the API boundary so the scan carry never materializes V
    # duplicates (at V = JL the duplicates would dwarf everything else).
    out_a_t: jax.Array
    out_b_t: jax.Array
    # Count of non-finite solver outputs zeroed by the NaN guards this
    # hop (int32 scalar; 0 = healthy). The reference hard-asserts instead
    # (apvast.py:216 et al.); here a silenced hop stays audible in
    # metrics so a conditioning regression cannot hide.
    silenced: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.int32(0)
    )


def _spectral_norm(mat: jax.Array) -> jax.Array:
    """2-norm of a symmetric PSD matrix (for the MATLAB loading variants,
    apVast.m:552-569 and Python/apvast.py:25-27) by power iteration on
    R^2 — two matvecs per step square the convergence ratios, so even a
    clustered top spectrum (plain power iteration's hard case) lands
    within ~1% of the exact ``norm(R)`` the reference uses; verified
    against ``np.linalg.norm(R, 2)`` in
    tests/test_subspace_solver.py::test_spectral_norm_matches_exact.

    Normalizes between the two matvecs: an unnormalized R(Rv) has
    entries ~lambda^2, whose float32 norm-of-squares overflows to inf
    once ||R|| > ~1e9 (exactly the ill-scaled scenes the MATLAB loading
    exists to stabilize), silently returning 0.0/NaN. The direction is
    unchanged by the intermediate normalization, so the squared
    convergence ratio is preserved."""
    v = jnp.ones((mat.shape[-1],), dtype=mat.dtype)
    def body(v, _):
        w = mat @ v
        w = w / (jnp.linalg.norm(w) + 1e-30)
        w = mat @ w
        return w / (jnp.linalg.norm(w) + 1e-30), None
    v, _ = jax.lax.scan(body, v / jnp.linalg.norm(v), None, length=12)
    return jnp.abs(v @ (mat @ v))


def convolve_inputs(config, plan, conv_history, resp, target_resp, hops):
    """Stage 1: streaming RIR convolution (ref apvast.py:167-194), shared
    by the time-domain and frequency-domain engines. Two equivalent
    implementations: batched overlap-save FFTs, or (use_pallas_conv) one
    windows-matmul Pallas kernel per program signal.

    ``resp``/``target_resp`` are the TAIL-form response blocks (first
    block - hop samples); returns the updated conv history and the
    (tail, fresh-hop) PAIRS forming the conceptual full blocks — the
    analysis stage consumes the pair without materializing the
    concatenation (split-contraction DFT matmuls), so the reference's
    per-hop response-buffer slide (apvast.py:173) costs nothing at the
    production 50% hop."""
    hop = config.hop
    nf = config.fir_fft_size
    m = resp.shape[1]
    s = resp.shape[2]
    segments = jnp.concatenate([conv_history, hops], axis=-1)  # (2, nf)
    if config.use_pallas_conv:
        from apvast_tpu.ops.pallas.streaming_conv import streaming_conv_pallas

        out = streaming_conv_pallas(
            segments,
            plan.conv_kernels,
            hop,
            interpret=(jax.default_backend() == "cpu"),
        )  # (2, 2*m*s + m, hop)
        ms = m * s
        # Row layout per signal: [rir_A (m*s), rir_B (m*s), target_z (m)].
        new_resp = jnp.stack(
            [
                out[0, :ms],
                out[0, ms : 2 * ms],
                out[1, :ms],
                out[1, ms : 2 * ms],
            ]
        ).reshape(4, m, s, hop)
        new_target = out[:, 2 * ms :, :]  # (2, m, hop)
    else:
        seg_spec = jnp.fft.rfft(segments, axis=-1)  # (2, nf/2+1)
        path_spec = (
            plan.rir_spec[jnp.asarray(_PATH_RIR)]
            * seg_spec[jnp.asarray(_PATH_SIGNAL)][:, None, None, :]
        )  # (4, m, s, nf/2+1)
        new_resp = irfft_batched(path_spec, nf)[..., nf - hop :]
        tgt_path_spec = plan.target_rir_spec * seg_spec[:, None, :]  # (2, m, ·)
        new_target = irfft_batched(tgt_path_spec, nf)[..., nf - hop :]
    return (
        segments[:, hop:],
        (resp, new_resp),
        (target_resp, new_target),
    )


def _analyze(config, plan, blocks):
    """WOLA analysis: FFT custom-call, or (use_matmul_dft) two MXU
    matmuls against the plan's DFT matrices — numerically the same
    transform with O(N) instead of O(log N) rounding. The analysis
    window is FOLDED INTO the matmul matrices (plan.py), so the
    matmul-DFT path applies no elementwise window pass.

    ``blocks`` may be a (tail, fresh) PAIR of a tail-form sliding block
    (engine stage 1): the matmul-DFT contracts each part against the
    matching row slice of the DFT matrices — the same sums as the
    concatenated block, never materialized. The FFT path concatenates
    (a custom call needs the contiguous block)."""
    if isinstance(blocks, tuple):
        if config.use_matmul_dft:
            tail, fresh = blocks
            split = tail.shape[-1]
            re = jnp.einsum(
                "...n,nk->...k",
                tail,
                plan.dft_cos[:split],
                preferred_element_type=tail.dtype,
            ) + jnp.einsum(
                "...n,nk->...k",
                fresh,
                plan.dft_cos[split:],
                preferred_element_type=fresh.dtype,
            )
            im = jnp.einsum(
                "...n,nk->...k",
                tail,
                plan.dft_sin[:split],
                preferred_element_type=tail.dtype,
            ) + jnp.einsum(
                "...n,nk->...k",
                fresh,
                plan.dft_sin[split:],
                preferred_element_type=fresh.dtype,
            )
            return re - 1j * im
        blocks = jnp.concatenate(blocks, axis=-1)
    if config.use_matmul_dft:
        x = blocks
        re = jnp.einsum(
            "...n,nk->...k", x, plan.dft_cos, preferred_element_type=x.dtype
        )
        im = -jnp.einsum(
            "...n,nk->...k", x, plan.dft_sin, preferred_element_type=x.dtype
        )
        return re + 1j * im
    return wola_analyze(plan.window, blocks)


def _synthesize(config, plan, spectra, block):
    """WOLA synthesis: inverse FFT, or inverse-DFT matmuls (synthesis
    window folded into the inverse matrices — see plan.py)."""
    if config.use_matmul_dft:
        return jnp.einsum(
            "...k,kn->...n",
            jnp.real(spectra),
            plan.idft_cos,
            preferred_element_type=plan.idft_cos.dtype,
        ) - jnp.einsum(
            "...k,kn->...n",
            jnp.imag(spectra),
            plan.idft_sin,
            preferred_element_type=plan.idft_sin.dtype,
        )
    return wola_synthesize(plan.window, spectra, block)


def target_weighting(config, plan, target_resp):
    """WOLA analysis of the target responses + the perceptual weighting
    derived from them (ref apvast.py:197-209,313-327). Returns
    (t_spec, weighting)."""
    t_spec = _analyze(config, plan, target_resp)  # (2, m, bins) complex
    if config.perceptual:
        weighting = perceptual_gain(
            t_spec,
            plan.cfmr_sq,
            plan.cs,
            plan.ca,
            plan.leff,
            plan.spectrum_scale,
            config.weighting_norm,
        )  # (2, m, bins) real
    else:
        # apvast.py:325-327
        weighting = jnp.ones(t_spec.shape, dtype=jnp.dtype(config.dtype))
    return t_spec, weighting


def _signal_gate(config, dtype):
    """Zone run flags gate by *signal*: paths 0,1 carry signal A, paths
    2,3 signal B (apvast.py:245-255). Static; folds into constants."""
    return jnp.asarray(
        [float(config.run_a)] * 2 + [float(config.run_b)] * 2, dtype=dtype
    )


def weighted_spectra(config, plan, resp, target_resp):
    """Stages 2+3 (spectral part): WOLA analysis of the target and
    loudspeaker responses, perceptual weighting, zone gating
    (ref apvast.py:197-209,237-262). Returns (t_spec_weighted, r_spec
    weighted+gated, weighting)."""
    dtype = jnp.dtype(config.dtype)
    t_spec, weighting = target_weighting(config, plan, target_resp)
    r_spec = _analyze(config, plan, resp)  # (4, m, s, bins)
    gate = _signal_gate(config, dtype)
    r_spec = r_spec * gate[:, None, None, None]
    r_spec = r_spec * weighting[jnp.asarray(_PATH_ZONE)][:, :, None, :]
    return t_spec * weighting, r_spec, weighting


def process_hop(
    config: ApVastConfig,
    plan: ApVastPlan,
    state: ApVastState,
    hop_a: jax.Array,
    hop_b: jax.Array,
    mic_axis: str | None = None,
    rebuild_override: jax.Array | None = None,
) -> tuple[ApVastState, HopOutputs]:
    """One hop. ``mic_axis``: when running inside ``shard_map`` with the
    microphone axis sharded over a mesh axis of that name, the statistics
    accumulation psums partial (R, r) over it — the only cross-device
    communication in the whole hop (survey §5 'distributed backend').

    ``rebuild_override``: tracking whitening only — a SCALAR bool that
    replaces the state-derived preconditioner-rebuild predicate. Batched
    callers (vmap over scenes) must pass this with ``in_axes=None``: the
    per-state predicate would be batched, turning the rebuild
    ``lax.cond`` into a select that pays the (n, n) factorization every
    hop for every stream (the round-3 multi-stream throughput loss)."""
    dtype = jnp.dtype(config.dtype)
    hop, block = config.hop, config.block_size
    j, s, v = config.filter_length, config.num_srcs, config.num_eigenvectors
    if mic_axis is not None and config.use_pallas_conv:
        raise ValueError(
            "use_pallas_conv is incompatible with mic sharding (the kernel "
            "row stack folds the global mic axis)"
        )
    # Local microphone count: equals config.num_mics unless the mic axis
    # is sharded (shard_map hands each device its mic block).
    m = state.resp.shape[1]
    win = plan.window

    # ---- 1. streaming RIR convolution (ref apvast.py:167-194) ----------
    hops = jnp.stack([hop_a, hop_b]).astype(dtype)  # (2, hop)
    conv_history, resp, target_resp = convolve_inputs(
        config, plan, state.conv_history, state.resp, state.target_resp, hops
    )  # resp/target_resp are (tail, fresh) pairs — see convolve_inputs

    # ---- 2+3. perceptual weighting of target and responses -------------
    if config.weighting_conv_taps is not None:
        from apvast_tpu.ops.weighting_conv import (
            circular_weighting_conv,
            weighting_kernel,
        )

        # Truncated time-domain weighting: the target path stays exact
        # (2M rows — cheap, and it feeds r), the 4MS-row response round
        # trip becomes a banded circular convolution.
        t_spec, weighting = target_weighting(config, plan, target_resp)
        wt_spec = t_spec * weighting
        kernels = weighting_kernel(
            weighting, block, config.weighting_conv_taps, plan.idft_cos_plain
        )  # (2, m, T)
        gate = _signal_gate(config, dtype)
        resp_full = jnp.concatenate(resp, axis=-1)
        y = circular_weighting_conv(
            win * resp_full, kernels, config.weighting_conv_taps
        )
        new_wr = win * (y * gate[:, None, None, None])
    else:
        wt_spec, r_spec, _ = weighted_spectra(config, plan, resp, target_resp)
        new_wr = _synthesize(config, plan, r_spec, block)
    new_wt = _synthesize(config, plan, wt_spec, block)
    wtarget_overlap, wt_emit = wola_overlap_add_tail(
        state.wtarget_overlap, new_wt, hop
    )
    wtarget_stat = slide(state.wtarget_stat, wt_emit)

    wresp_overlap, wr_emit = wola_overlap_add_tail(
        state.wresp_overlap, new_wr, hop
    )
    # Statistics-buffer update. Under the PYTHON Toeplitz variant every
    # consumer needs the sample-J-deleted view (ops/framing.py docstring),
    # and when hop > J the deleted sample of one hop has slid out of the
    # window by the next — so the state can carry the DELETED buffer
    # directly and the slide + deletion collapse into one concatenation
    # (raw[t] = deleted[t-1] for t > J recovers the slide sources).
    python_del = config.toeplitz_variant is ToeplitzVariant.PYTHON
    carried_del = config.carried_deleted_statistics  # matches init_state
    if carried_del:
        prev = state.wresp_stat  # deleted form, (..., stat_len - 1)
        wresp_stat = jnp.concatenate(
            [prev[..., hop - 1 : hop - 1 + j], prev[..., hop + j :], wr_emit],
            axis=-1,
        )
    else:
        wresp_stat = slide(state.wresp_stat, wr_emit)

    # ---- 4. statistics (ref apvast.py:329-364) -------------------------
    # PYTHON Toeplitz variant == statistics of the sample-J-deleted
    # buffer (see ops/framing.py). With the deleted-form carry above the
    # deletion has already happened; otherwise apply it here.
    if python_del and not carried_del:
        buf_eff = jnp.concatenate(
            [wresp_stat[..., :j], wresp_stat[..., j + 1 :]], axis=-1
        )
    else:
        buf_eff = wresp_stat
    k = buf_eff.shape[-1] - j + 1
    d = wtarget_stat[..., -k:]  # (2, m, k) target alignment
    use_lag = config.use_lag_statistics
    if (
        use_lag
        and config.lag_assembly == "skew"
        and s % 8
        and jax.default_backend() != "cpu"
    ):
        # The skew-assembly kernel needs the source count to be a
        # multiple of 8 (Mosaic block sublane alignment); fall back to
        # the dense statistics path for other geometries.
        use_lag = False
    # Half-form rides the skew kernel INTO the tracking solver; when
    # the geometry forced the dense fallback above, or the config uses
    # a solver that consumes completed matrices (e.g. the exact-eigh
    # quality oracle overriding production_overrides), fall back to the
    # completed form (same silent-degrade convention as the skew
    # fallback itself — both are internal representation toggles, not
    # quality knobs).
    half_form = (
        config.statistics_half_form
        and use_lag
        and config.lag_assembly == "skew"
        and config.gevd_solver is GevdSolver.SUBSPACE
        and config.subspace_whiten == "tracking"
    )
    if half_form and config.regularization is not RegularizationVariant.PYTHON:
        raise ValueError(
            "statistics_half_form supports PYTHON regularization only "
            "(norm-based loading needs the completed matrix)"
        )
    tap_major = use_lag and config.lag_assembly == "tap"
    if use_lag:
        from apvast_tpu.ops.lag_statistics import (
            covariance_via_lags,
            covariance_via_lags_skew,
            covariance_via_lags_tap,
            covariance_via_lags_wide,
        )

        cov_fn = {
            "tap": covariance_via_lags_tap,
            "pair": covariance_via_lags,
            "wide": covariance_via_lags_wide,
            "skew": covariance_via_lags_skew,
        }[config.lag_assembly]
        if half_form:
            r_mats, r_vecs = covariance_via_lags_skew(
                buf_eff, d, j, form="half"
            )
        else:
            r_mats, r_vecs = cov_fn(buf_eff, d, j)
    elif config.use_pallas_statistics:
        if dtype != jnp.float32:
            raise ValueError("use_pallas_statistics requires dtype=float32")
        from apvast_tpu.ops.pallas.statistics import covariance_pallas

        r_mats, r_cross = covariance_pallas(
            buf_eff, d, j, interpret=(jax.default_backend() == "cpu")
        )
        # Bright paths against their own zone's target
        # (Python/apvast.py:340,356).
        r_vecs = jnp.stack([r_cross[0, :, 0], r_cross[3, :, 1]])
    else:
        # The deletion (when any) is already in buf_eff: frame as-is.
        frames = frame_buffer(buf_eff, j, ToeplitzVariant.MATLAB)
        # (4, m, s, k, j) -> Y with rows = source-major reversed taps.
        y = (
            jnp.flip(frames, axis=-1)
            .transpose(0, 1, 2, 4, 3)
            .reshape(4, m, s * j, k)
        )
        r_mats = jnp.einsum("pmak,pmbk->pab", y, y, preferred_element_type=dtype)
        r_vecs = jnp.einsum(
            "zmak,zmk->za",
            y[jnp.asarray([0, 3])],  # bright paths A->A and B->B
            d,
            preferred_element_type=dtype,
        )  # (2, s*j)
    if mic_axis is not None:
        # Mic axis is sharded: the einsums above contracted only the local
        # microphones; all-reduce the partial statistics over ICI.
        r_mats = jax.lax.psum(r_mats, mic_axis)
        r_vecs = jax.lax.psum(r_vecs, mic_axis)
    if config.normalize_statistics:  # apVast.m:448-456
        scale = 1.0 / (k * config.num_mics)  # global mic count
        r_mats = r_mats * scale
        r_vecs = r_vecs * scale

    # ---- 5. GEVD + variable-span synthesis (ref apvast.py:378-422) -----
    # Zone A pencil: (R_AA, R_AB); zone B pencil: (R_BB, R_BA).
    a_stack = r_mats[jnp.asarray([0, 3])]
    b_stack = r_mats[jnp.asarray([1, 2])]
    eye = jnp.eye(s * j, dtype=dtype)

    if config.effective_reg_b_relative > 0:
        # Scale-aware extra loading for float32 production on scenes whose
        # covariance magnitude dwarfs the reference's absolute reg_b.
        # Works unchanged in half form: tr(M) = tr(B)/2 and M needs half
        # of B's loading, so the relative-times-half-trace product IS
        # the right half loading.
        mean_diag = jnp.einsum("zii->z", b_stack) / (s * j)
        b_stack = b_stack + (
            config.effective_reg_b_relative * mean_diag
        )[:, None, None] * eye

    if config.regularization is RegularizationVariant.PYTHON:
        reg = config.reg_b
    elif config.regularization is RegularizationVariant.PYTHON_NORM:
        norms = jax.vmap(_spectral_norm)(b_stack)
        b_stack = b_stack + 1e-8 * norms[:, None, None] * eye
        reg = 0.0
    else:  # MATLAB diagonal loading on both matrices (apVast.m:552-569)
        a_norms = jax.vmap(_spectral_norm)(a_stack)
        b_norms = jax.vmap(_spectral_norm)(b_stack)
        a_stack = a_stack + config.bright_loading * a_norms[:, None, None] * eye
        b_stack = b_stack + config.dark_loading * b_norms[:, None, None] * eye
        reg = 0.0

    if not config.run_a:  # keep the disabled zone's pencil factorizable
        filler = 0.5 * eye if half_form else eye  # half: M + M^T = I
        a_stack = a_stack.at[0].set(filler)
        b_stack = b_stack.at[0].set(filler)
    if not config.run_b:
        filler = 0.5 * eye if half_form else eye
        a_stack = a_stack.at[1].set(filler)
        b_stack = b_stack.at[1].set(filler)

    gevd_q = state.gevd_q
    gevd_minv = state.gevd_minv
    gevd_lam = state.gevd_lam
    gevd_hop = state.gevd_hop
    gevd_resid = state.gevd_resid
    if config.gevd_solver is GevdSolver.SUBSPACE and (
        config.subspace_whiten == "tracking"
    ):
        if dtype != jnp.float32 and config.small_eigh == "jacobi":
            raise ValueError(
                "small_eigh='jacobi' is a float32 kernel — it would "
                "silently degrade a float64 parity config"
            )
        if config.use_pallas_subspace or config.use_pallas_whiten:
            raise ValueError(
                "use_pallas_subspace/use_pallas_whiten require "
                "subspace_whiten='invert'"
            )
        from apvast_tpu.ops.jdiag import jdiag_topk_tracked

        if rebuild_override is not None:
            rebuild = rebuild_override
        else:
            rebuild = jnp.logical_or(
                gevd_hop < config.tracking_warmup_hops,
                gevd_hop % config.tracking_rebuild_period == 0,
            )
            if config.tracking_residual_rebuild > 0 and (
                state.gevd_resid is not None
            ):
                # Residual-triggered fallback (VERDICT r4 #4): when the
                # previous hop's Ritz residual says the carried basis/
                # preconditioner went stale between cadence rebuilds
                # (level step, spectral shift), rebuild NOW instead of
                # waiting out the fixed period.
                rebuild = jnp.logical_or(
                    rebuild,
                    state.gevd_resid > config.tracking_residual_rebuild,
                )
        (
            u, lam, gevd_q, gevd_lam, gevd_minv, silenced, gevd_resid,
        ) = jdiag_topk_tracked(
            a_stack,
            b_stack,
            reg,
            v,
            state.gevd_q,
            state.gevd_lam,
            state.gevd_minv,
            rebuild,
            config.tracking_outer_steps,
            config.small_eigh,
            config.jacobi_sweeps,
            interpret=(jax.default_backend() == "cpu"),
            residual_precision=config.tracking_residual_precision,
            rr_basis=config.tracking_rr_basis,
            half_form=half_form,
        )
        gevd_hop = gevd_hop + 1
    elif config.gevd_solver is GevdSolver.SUBSPACE and (
        config.subspace_whiten == "newton"
    ):
        if config.use_pallas_subspace:
            raise ValueError(
                "use_pallas_subspace requires subspace_whiten='invert'"
            )
        if dtype != jnp.float32 and config.small_eigh == "jacobi":
            raise ValueError(
                "small_eigh='jacobi' is a float32 kernel — it would "
                "silently degrade a float64 parity config"
            )
        from apvast_tpu.ops.jdiag import jdiag_topk_pencil_batched

        u, lam, gevd_q, gevd_minv, silenced = jdiag_topk_pencil_batched(
            a_stack,
            b_stack,
            reg,
            v,
            config.subspace_iters,
            state.gevd_q,
            state.gevd_minv,
            config.subspace_orth,
            config.small_eigh,
            config.jacobi_sweeps,
            interpret=(jax.default_backend() == "cpu"),
        )
    elif config.gevd_solver is GevdSolver.SUBSPACE:
        if dtype != jnp.float32 and (
            config.small_eigh == "jacobi" or config.use_pallas_subspace
        ):
            raise ValueError(
                "small_eigh='jacobi' and use_pallas_subspace are float32 "
                "kernels — they would silently degrade a float64 parity "
                "config to float32 precision"
            )
        if config.use_pallas_whiten and dtype != jnp.float32:
            raise ValueError(
                "use_pallas_whiten is a float32 kernel — it would "
                "silently degrade a float64 parity config"
            )
        # The fused whitening-setup kernel is VMEM-resident; scenes past
        # jl = 1024 (after 128-padding) fall back to the XLA chain.
        whiten_kernel = (
            config.use_pallas_whiten
            and config.subspace_whiten == "invert"
            and -(-config.jl // 128) * 128 <= 1024
        )
        # Warm-started blocked subspace iteration for the top eigenpairs
        # (ops/jdiag.jdiag_topk) — MXU matmuls instead of a dense eigh.
        u, lam, gevd_q, silenced = jdiag_topk_batched(
            a_stack,
            b_stack,
            reg,
            v,
            config.subspace_iters,
            state.gevd_q,
            config.subspace_orth,
            config.subspace_whiten,
            config.small_eigh,
            config.jacobi_sweeps,
            interpret=(jax.default_backend() == "cpu"),
            fused_iteration=config.use_pallas_subspace,
            whiten_kernel=whiten_kernel,
        )  # (2, jl, v), (2, v), (2, jl, k), int32
    else:
        u, lam = jdiag_batched(a_stack, b_stack, reg)  # (2, jl, jl), (2, jl)
        # The exact path has no zeroing guard (parity semantics) — still
        # COUNT non-finites so observability surfaces a blowup.
        silenced = jnp.sum(~jnp.isfinite(u), dtype=jnp.int32) + jnp.sum(
            ~jnp.isfinite(lam), dtype=jnp.int32
        )
    w_family = jax.vmap(variable_span_filters, in_axes=(0, 0, 0, None, None))(
        u, lam, r_vecs, config.mu, v
    )  # (2, v, jl)
    zone_gate = jnp.asarray([float(config.run_a), float(config.run_b)], dtype=dtype)
    w_family = w_family * zone_gate[:, None, None]

    if config.output_spans is not None:
        # MATLAB multi-solution mode (apVast.m:113-120,527-549): keep only
        # the requested span ranks for output synthesis.
        span_idx = jnp.asarray([sp - 1 for sp in config.output_spans])
        w_family = w_family[:, span_idx]
    v = config.num_solutions

    # w layout is source-major (w[s*j + tap]); reshape to (zone, v, s, j)
    # == the reference's order='F' reshape (apvast.py:417). In tap-major
    # statistics mode the eigenvectors (hence w) carry the permuted
    # (tap, src) ordering — same filters, transposed extraction.
    if tap_major:
        filters = w_family.reshape(2, v, j, s).swapaxes(-1, -2)
    else:
        filters = w_family.reshape(2, v, s, j)

    # ---- 6. slide input blocks (ref apvast.py:424-426) -----------------
    input_blocks = slide(state.input_blocks, hops)

    # ---- 7. output synthesis (ref apvast.py:428-506) -------------------
    if config.use_pallas_output:
        if dtype != jnp.float32:
            raise ValueError("use_pallas_output requires dtype=float32")
        from apvast_tpu.ops.pallas.output_filter import (
            circular_filter_overlap_pallas,
        )

        # The spectral product with a J-tap filter IS a circular
        # convolution: one MXU matmul for the whole rank family instead
        # of ~2VS FFTs — with the synthesis window and the tail-form
        # overlap-add fused into the kernel epilogue (the full synthesis
        # tile never round trips through HBM).
        win_in = win * input_blocks  # (2, block)
        bh = block - hop
        emit_f, tail_f = circular_filter_overlap_pallas(
            win_in,
            filters.reshape(2, v * s, j),
            win,
            state.out_overlap.reshape(2, v * s, bh),
            hop,
            interpret=(jax.default_backend() == "cpu"),
        )
        out_emit = emit_f.reshape(2, v, s, hop)
        out_overlap = tail_f.reshape(2, v, s, bh)
        # The target filter is a delta at (reference index, modeling
        # delay) (apvast.py:389-390) — its circular convolution is a roll.
        rolled = jnp.roll(win_in, config.modeling_delay, axis=-1)
        if config.target_filter is TargetFilterVariant.SHARED_A:
            refs = (config.reference_index_a, config.reference_index_a)
        else:
            refs = (config.reference_index_a, config.reference_index_b)
        t_blocks = jnp.zeros((2, s, block), dtype=dtype)
        t_blocks = t_blocks.at[0, refs[0]].set(rolled[0])
        t_blocks = t_blocks.at[1, refs[1]].set(rolled[1])
        new_t_out = win * t_blocks
    else:
        filt_spec = rfft_batched(filters, block)  # (2, v, s, bins)
        in_spec = _analyze(config, plan, input_blocks)  # (2, bins)
        out_spec = in_spec[:, None, None, :] * filt_spec
        new_out = _synthesize(config, plan, out_spec, block)
        t_out_spec = in_spec[:, None, :] * plan.target_filter_spec
        new_t_out = _synthesize(config, plan, t_out_spec, block)
        out_overlap, out_emit = wola_overlap_add_tail(
            state.out_overlap, new_out, hop
        )
    target_out_overlap, t_emit = wola_overlap_add_tail(
        state.target_out_overlap, new_t_out, hop
    )

    # Emit (v, hop, srcs); targets as a single (hop, srcs) copy (the
    # wrappers broadcast to the reference's per-rank duplicated target
    # list, apvast.py:501-504 — no per-rank target buffers in the carry).
    out_vhs = out_emit.transpose(0, 1, 3, 2)  # (2, v, hop, s)
    t_vhs = t_emit.transpose(0, 2, 1)  # (2, hop, s)

    new_state = ApVastState(
        conv_history=conv_history,
        resp=slide_tail(resp[0], resp[1], hop),
        target_resp=slide_tail(target_resp[0], target_resp[1], hop),
        wresp_overlap=wresp_overlap,
        wtarget_overlap=wtarget_overlap,
        wresp_stat=wresp_stat,
        wtarget_stat=wtarget_stat,
        input_blocks=input_blocks,
        out_overlap=out_overlap,
        target_out_overlap=target_out_overlap,
        gevd_q=gevd_q,
        gevd_minv=gevd_minv,
        gevd_lam=gevd_lam,
        gevd_hop=gevd_hop,
        gevd_resid=gevd_resid,
    )
    outputs = HopOutputs(
        out_a=out_vhs[0] if config.run_a else None,
        out_b=out_vhs[1] if config.run_b else None,
        out_a_t=t_vhs[0],
        out_b_t=t_vhs[1],
        silenced=silenced,
    )
    return new_state, outputs
