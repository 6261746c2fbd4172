"""Frequency-domain (DFT-domain) AP-VAST — the low-cost operating mode.

Positioning (PERF.md "FD-engine quality frontier" + round-4 speed):
the PRODUCTION point is ``fd_span="full"`` — the full-span VAST
solution telescopes to one batched tiny Cholesky solve per bin, no
eigendecomposition — measured 0.39 ms/hop (RTF 42.7x) independent /
0.73 ms/hop (22.8x) leakage-coupled on v5e with ``use_matmul_dft``:
~3x cheaper than the TD production engine (1.18 ms/hop). Quality: the
per-bin-INDEPENDENT formulation measures ~15-16 dB contrast; its
binding constraint is the J-tap truncation projection's spectral
leakage, and ``fd_bin_coupling`` (leakage-aware smoothed statistics,
same solver cost) moves the measured frontier to 17.4/18.7 dB at
NMSE 0.06 (pinned: coupling 7, frame taps 2). The time-domain engine
remains the contrast product (25-31 dB). Use the FD engine where
cost, target fidelity (NMSE ~0.06 vs ~0.19 TD), latency, or per-chip
stream count dominates the contrast requirement; ``fd_span="all"`` is
the variable-span analysis mode (per-bin rank 1..S*B via batched
Hermitian GEVDs).

The time-domain engine solves one JL x JL generalized eigenproblem per
zone per hop (JL = filter_length * srcs, e.g. 800) — the reference's
formulation (Python/apvast.py:329-422) and its dominant cost on any
hardware. This engine reformulates the trade-off *per STFT bin*: each
bin's spatial covariance pencil is only S x S (S = #loudspeakers), and
all ``2 * num_bins`` tiny Hermitian GEVDs solve in one vmapped ``eigh`` —
hundreds of matmul-shaped problems instead of one LAPACK-shaped one.
This is the "DFT-domain VAST" design the reference's README points to
for fast implementations (README.md:6, the vast_dft lineage); it is a
different trade-off (per-bin variable span, rank 1..S per bin; filters
constrained back to J taps by projection) and is validated on the
acoustic metrics, not sample parity with the time-domain reference.

Shared with the time-domain engine: the streaming RIR convolution,
perceptual weighting and WOLA output synthesis (imported from
``engine.hop``). Replaced: time-domain framing/statistics -> per-bin
exponentially-weighted covariance recursion; the big GEVD -> batched
per-bin Hermitian jdiag; rank-V cumulative synthesis is unchanged in
form but runs per bin.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine.hop import (
    HopOutputs,
    _analyze,
    _synthesize,
    convolve_inputs,
    weighted_spectra,
)
from apvast_tpu.engine.plan import ApVastPlan
from apvast_tpu.ops.jdiag import jdiag_hermitian_batched
from apvast_tpu.ops.wola import (
    irfft_batched,
    rfft_batched,
    slide,
    slide_tail,
    wola_overlap_add_tail,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FdState:
    """Carry of the frequency-domain engine. No time-domain statistics
    buffers — the per-bin covariance recursion replaces them."""

    conv_history: jax.Array  # (2, fir_history)
    resp: jax.Array  # (4, mics, srcs, block - hop) — tail form
    target_resp: jax.Array  # (2, mics, block - hop) — tail form
    input_blocks: jax.Array  # (2, block)
    out_overlap: jax.Array  # (2, V, srcs, block - hop) — tail form
    target_out_overlap: jax.Array  # (2, srcs, block - hop) — tail form
    # Exponentially-weighted per-bin statistics; with cross-frame taps
    # (config.fd_frame_taps = B > 1) the per-bin vectors stack the last B
    # frames, so the covariance blocks are (S*B, S*B).
    cov: jax.Array  # (4, bins, srcs*B, srcs*B) complex
    cross: jax.Array  # (2, bins, srcs*B) complex
    # Cross-frame tap history (None when B == 1): the last B-1 weighted
    # response spectra and input spectra, most recent first.
    spec_hist: jax.Array | None = None  # (B-1, 4, mics, srcs, bins)
    in_spec_hist: jax.Array | None = None  # (B-1, 2, bins)


def _project_spec(config, plan, spec):
    """J-tap truncation projection along the trailing bins axis:
    ifft -> truncate to filter_length taps -> fft. Under use_matmul_dft
    both directions are thin MXU contractions against the plan's
    (bins, J)/(J, bins) projection matrices — on TPU the size-N FFT
    custom call decomposes into dozens of relayout-heavy small ops
    (PERF.md round-4 breakdown). ``spec``: (..., bins) complex."""
    if config.use_matmul_dft:
        re, im = jnp.real(spec), jnp.imag(spec)
        w_time = jnp.einsum(
            "...k,kj->...j", re, plan.proj_idft_cos,
            preferred_element_type=re.dtype,
        ) - jnp.einsum(
            "...k,kj->...j", im, plan.proj_idft_sin,
            preferred_element_type=im.dtype,
        )
        return jnp.einsum(
            "...j,jk->...k", w_time, plan.proj_dft_cos,
            preferred_element_type=w_time.dtype,
        ) - 1j * jnp.einsum(
            "...j,jk->...k", w_time, plan.proj_dft_sin,
            preferred_element_type=w_time.dtype,
        )
    block = config.block_size
    w_time = irfft_batched(spec, block)[..., : config.filter_length]
    return rfft_batched(w_time, block)


def _coupled_refine(config, plan, h, cross, q_raw, reg_vec, w0):
    """Exact-coupling iterative refinement (config.fd_coupled_iters).

    The realized (J-tap-projected) bright/dark energies couple ALL bins
    through the projection K: E(w) = sum_f (Kw)_f^H Q_f (Kw)_f. The
    fd_bin_coupling smoothing keeps only the bin-diagonal of
    C = K^adj Q K, and group solves (fd_group_size) cut hard group
    boundaries inside the Dirichlet coherence width (block/J bins) —
    both measured well short of this: damped Richardson iteration on
    the GLOBAL Tikhonov-regularized normal equations

        (K^adj (A + mu B) K + mu reg I) w = K^adj r,

    preconditioned by the per-bin smoothed+loaded pencils ``h`` (the
    exact bin-diagonal of the global operator). K is applied exactly
    via the engine's own projection (two thin matmul-DFT contractions
    per iteration); its adjoint comes from jax.linear_transpose over
    the real-pair representation (K is real-linear, not
    complex-linear: irfft implies conjugate-symmetric extension).

    ``h``: (2, bins, sb, sb) preconditioner pencils; ``cross``:
    (2, bins, sb) UNsmoothed cross vector; ``q_raw``: (2, bins, sb, sb)
    unsmoothed A + mu*B; ``reg_vec``: (2, bins) Tikhonov scale;
    ``w0``: (2, bins, sb) warm start (the per-bin smoothed solution).
    """
    from jax.scipy.linalg import solve_triangular

    from apvast_tpu.ops.small_chol import cholesky_small

    mu = jnp.asarray(config.mu, q_raw.dtype)

    def k_pair(re, im):
        out = _project_spec(config, plan, re + 1j * im)
        return jnp.real(out), jnp.imag(out)

    # w layout for projection: (2, sb, bins) — K acts per (tap, src)
    # row along bins.
    ex_re = jnp.zeros((2, w0.shape[2], w0.shape[1]), jnp.real(w0).dtype)
    k_adj = jax.linear_transpose(k_pair, ex_re, ex_re)

    def apply_k(w):  # (2, bins, sb) -> (2, bins, sb)
        s = _project_spec(config, plan, w.swapaxes(1, 2))
        return s.swapaxes(1, 2)

    def apply_k_adj(y):
        yt = y.swapaxes(1, 2)
        re, im = k_adj((jnp.real(yt), jnp.imag(yt)))
        return (re + 1j * im).swapaxes(1, 2)

    b = apply_k_adj(cross)
    tik = (mu * reg_vec.astype(q_raw.dtype))[:, :, None]

    def apply_c(w):
        kw = apply_k(w)
        qkw = jnp.einsum("zfst,zft->zfs", q_raw, kw)
        return apply_k_adj(qkw) + tik * w

    chol = cholesky_small(h.reshape(-1, h.shape[-1], h.shape[-1]))

    def precond(r):
        r2 = r.reshape(-1, r.shape[-1], 1)
        y = solve_triangular(chol, r2, lower=True)
        x = solve_triangular(
            jnp.conj(chol.swapaxes(-1, -2)), y, lower=False
        )
        return x.reshape(r.shape)

    if config.fd_coupled_method == "cg":
        # Preconditioned CG, per-zone scalars (the operator and
        # preconditioner are zone-block-diagonal). CG is monotone in
        # the operator's energy norm, so a fixed small iteration count
        # cannot diverge the way Richardson does (measured: the
        # coupling operator's row mass is ~block/J times its diagonal,
        # so damped fixed-point iteration explodes).
        def zdot(a_, b_):  # Re<a,b> per zone -> (2, 1, 1)
            return jnp.sum(
                jnp.real(jnp.conj(a_) * b_), axis=(1, 2), keepdims=True
            )

        tiny = jnp.asarray(1e-30, jnp.real(w0).dtype)
        x = w0
        r = b - apply_c(x)
        z = precond(r)
        p = z
        rz = zdot(r, z)
        for _ in range(config.fd_coupled_iters):
            ap = apply_c(p)
            a_k = rz / jnp.maximum(zdot(p, ap), tiny)
            x = x + a_k.astype(x.dtype) * p
            r = r - a_k.astype(r.dtype) * ap
            z = precond(r)
            rz_new = zdot(r, z)
            beta = rz_new / jnp.maximum(rz, tiny)
            p = z + beta.astype(p.dtype) * p
            rz = rz_new
        return x

    alpha = jnp.asarray(config.fd_coupled_relax, jnp.real(w0).dtype)
    w = w0
    for _ in range(config.fd_coupled_iters):
        w = w + alpha.astype(w.dtype) * precond(b - apply_c(w))
    return w


def _smooth_bins(x, w, hw, nb):
    """``sum_o w[o] * x_virtual[f + o]`` along axis 1 (bins), where
    ``x_virtual`` mirrors conjugate-symmetrically about bin 0 (DC) and
    bin nb-1 (Nyquist): the statistics at a virtual bin m < 0 (or past
    Nyquist) are those of the real signal's negative-frequency line,
    R_{-f} = conj(R_f) (h_{-f} = conj(h_f) for real inputs), so
    DC/Nyquist neighborhoods see their true leakage environment instead
    of zeros. ``w`` has 2*hw + 1 entries for offsets -hw..hw."""
    xc = jnp.conj(x)
    ext = jnp.concatenate(
        [
            jnp.flip(xc[:, 1 : hw + 1], axis=1),
            x,
            jnp.flip(xc[:, nb - 1 - hw : nb - 1], axis=1),
        ],
        axis=1,
    )
    return sum(
        jnp.asarray(w[i], x.dtype) * ext[:, i : i + nb]
        for i in range(2 * hw + 1)
    )


def _solve_bin_groups(config, h_diag, q_raw, cross_d, p0, offs, shift):
    """Group-coupled full-span solve (config.fd_group_size = G > 1).

    The J-tap truncation projection makes the realized (projected)
    bright/dark energies couple bins: the exact quadratic has blocks
    C_{fg} = sum_o conj(P(o)) P(o + f - g) R_{f+o} / J^2, of which
    fd_bin_coupling's smoothing keeps only f = g. This solves the
    design jointly over groups of G adjacent bins — every within-group
    coupling block kept — as bins/G batched (G*S*B)^2 Hermitian solves
    per zone. ``h_diag`` (2, bins, sb, sb) is the loaded smoothed
    diagonal (identical to the G = 1 pencils); ``q_raw``
    (2, bins, sb, sb) is the unsmoothed combined pencil A + mu*B the
    off-diagonal blocks are built from; ``shift`` offsets the group
    partition (the fd_group_overlap second pass).

    Returns w: (2, bins, sb).
    """
    g = config.fd_group_size
    hw = config.fd_bin_coupling // 2
    nb = config.num_bins
    j = config.filter_length
    sb = h_diag.shape[-1]
    block = config.block_size

    def dirichlet(o):
        return np.exp(
            -2j * np.pi * np.outer(o, np.arange(j)) / block
        ).sum(axis=1)

    blocks_by_delta = {0: h_diag}
    for d in range(-(g - 1), g):
        if d == 0:
            continue
        w_d = np.conj(p0) * dirichlet(offs + d) / j**2
        blocks_by_delta[d] = _smooth_bins(q_raw, w_d, hw, nb)

    ngroups = -(-(nb + shift) // g)
    nbp = ngroups * g
    back = nbp - nb - shift
    def padfn(x):
        if not (shift or back):
            return x
        return jnp.pad(x, ((0, 0), (shift, back)) + ((0, 0),) * (x.ndim - 2))

    blocks = {d: padfn(v) for d, v in blocks_by_delta.items()}
    rows = []
    for i in range(g):
        # Group gg, slot i is padded bin gg*g + i -> blocks[d][:, i::g].
        row = [blocks[i - jj][:, i::g] for jj in range(g)]
        rows.append(jnp.stack(row, axis=3))  # (2, ngroups, sb, g, sb)
    hg = jnp.stack(rows, axis=2)  # (2, ngroups, g, sb, g, sb)
    gs = g * sb
    hg = hg.reshape(2, ngroups, gs, gs)
    rhs = padfn(cross_d).reshape(2, ngroups, gs, 1)
    if shift or back:
        # Padding slots: zero their rows/columns/rhs and put 1 on the
        # diagonal so the padded system stays PD and returns w = 0 there.
        vm = (
            (jnp.arange(nbp) >= shift) & (jnp.arange(nbp) < shift + nb)
        ).reshape(ngroups, g)
        vm = jnp.repeat(vm, sb, axis=1).astype(hg.real.dtype)
        hg = hg * vm[None, :, :, None] * vm[None, :, None, :]
        hg = hg + (1.0 - vm)[None, :, :, None] * jnp.eye(gs, dtype=hg.dtype)
        rhs = rhs * vm[None, :, :, None]
    # The o-window truncation breaks exact block-Hermitian pairing at
    # O(window tail); symmetrize before the PD solve.
    hg = 0.5 * (hg + jnp.conj(hg.swapaxes(-1, -2)))
    hg = hg.reshape(2 * ngroups, gs, gs)
    rhs = rhs.reshape(2 * ngroups, gs, 1)
    tol = config.fd_group_rank_tol
    if tol > 0:
        # Truncated pseudo-inverse: the group quadratic is singular to
        # working precision (see config.fd_group_rank_tol) — restrict
        # the solution to eigen-directions carrying real leakage energy.
        wl, ul = jnp.linalg.eigh(hg)
        cut = jnp.asarray(tol, wl.dtype) * wl[..., -1:]
        inv = jnp.where(wl > cut, 1.0 / jnp.maximum(wl, 1e-30), 0.0)
        bz = jnp.einsum("bji,bjk->bik", jnp.conj(ul), rhs)
        x = jnp.einsum("bij,bjk->bik", ul, inv[..., None] * bz)
    else:
        x = jnp.linalg.solve(hg, rhs)
    return x.reshape(2, nbp, sb)[:, shift : shift + nb]


def init_fd_state(
    config: ApVastConfig, key: jax.Array | None = None
) -> FdState:
    dtype = jnp.dtype(config.dtype)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    m, s = config.num_mics, config.num_srcs
    v = config.fd_num_solutions
    block, bins = config.block_size, config.num_bins
    if key is not None:
        k1, k2 = jax.random.split(key)
        scale = config.noise_init_scale
        resp = scale * jax.random.normal(k1, (4, m, s, block), dtype=dtype)
        target_resp = scale * jax.random.normal(k2, (2, m, block), dtype=dtype)
    else:
        resp = jnp.zeros((4, m, s, block), dtype=dtype)
        target_resp = jnp.zeros((2, m, block), dtype=dtype)
    resp = resp[..., config.hop :]  # tail form (see engine/state.py)
    target_resp = target_resp[..., config.hop :]
    # Complex zeros are created inside a jit: the TPU runtime in this
    # environment rejects EAGER complex-typed primitives (compiled complex
    # ops are fine) — see utils docs / PERF.md environment caveat.
    b = config.fd_frame_taps
    sb = s * b
    make_cov = jax.jit(
        lambda: (
            jnp.zeros((4, bins, sb, sb), dtype=cdtype),
            jnp.zeros((2, bins, sb), dtype=cdtype),
            jnp.zeros((b - 1, 4, m, s, bins), dtype=cdtype),
            jnp.zeros((b - 1, 2, bins), dtype=cdtype),
        )
    )
    cov, cross, spec_hist, in_spec_hist = make_cov()
    return FdState(
        conv_history=jnp.zeros((2, config.fir_history), dtype=dtype),
        resp=resp,
        target_resp=target_resp,
        input_blocks=jnp.zeros((2, block), dtype=dtype),
        out_overlap=jnp.zeros((2, v, s, block - config.hop), dtype=dtype),
        target_out_overlap=jnp.zeros((2, s, block - config.hop), dtype=dtype),
        cov=cov,
        cross=cross,
        spec_hist=spec_hist if b > 1 else None,
        in_spec_hist=in_spec_hist if b > 1 else None,
    )


def process_hop_fd(
    config: ApVastConfig,
    plan: ApVastPlan,
    state: FdState,
    hop_a: jax.Array,
    hop_b: jax.Array,
    forgetting: float = 0.9,
    reg: float | None = None,
    mic_axis: str | None = None,
) -> tuple[FdState, HopOutputs]:
    """One hop of the frequency-domain engine.

    ``forgetting``: exponential decay of the per-bin covariance recursion
    (the FD analog of the reference's sliding statistics buffer).
    ``reg``: diagonal loading per bin; the default is ``config.reg_b``
    as an absolute floor PLUS 1e-4 of each bin's mean dark-covariance
    trace (the additive trace term provides the scale invariance and
    dominates on warmed-up statistics).
    """
    dtype = jnp.dtype(config.dtype)
    hop, block = config.hop, config.block_size
    s, v = config.num_srcs, config.num_eigenvectors
    b = config.fd_frame_taps
    sb = s * b
    if v > sb:
        raise ValueError(
            f"frequency-domain span rank is per-bin: num_eigenvectors={v} "
            f"must be <= num_srcs * fd_frame_taps = {sb}"
        )
    if config.fd_span == "full" and v != sb:
        raise ValueError(
            "fd_span='full' is the telescoped full-span solve — it "
            f"requires num_eigenvectors == num_srcs * fd_frame_taps "
            f"({sb}), got {v}"
        )
    if config.output_spans is not None:
        # The FD engine's cumulative per-bin synthesis always emits every
        # rank 1..V; a span subset would silently change the rank axis
        # consumers see (config.num_solutions) — reject rather than drop.
        raise ValueError("output_spans is not supported by the FD engine")
    if mic_axis is not None and config.use_pallas_conv:
        # Same incompatibility as the TD engine (engine/hop.py): the
        # Pallas conv kernel's row stack folds the GLOBAL mic axis while
        # the sharded state carries only the local mic block — without
        # this guard the mismatch surfaces as an opaque concatenate
        # shape error at trace time.
        raise ValueError(
            "use_pallas_conv is incompatible with mic sharding (the kernel "
            "row stack folds the global mic axis)"
        )

    hops = jnp.stack([hop_a, hop_b]).astype(dtype)
    conv_history, resp, target_resp = convolve_inputs(
        config, plan, state.conv_history, state.resp, state.target_resp, hops
    )  # (tail, fresh) pairs — see engine/hop.convolve_inputs
    wt_spec, r_spec, _ = weighted_spectra(config, plan, resp, target_resp)
    # r_spec: (4, m, s, bins); wt_spec: (2, m, bins).

    # ---- per-bin statistics recursion ---------------------------------
    # R_f = lambda R_f + sum_m conj(h_m) h_m^T, r_f = ... conj(h_m) d_m.
    # With cross-frame taps the per-bin vector stacks the last B frames
    # (tap-major), lifting the per-bin rank ceiling from S to S*B.
    if b > 1:
        stacked = jnp.concatenate(
            [r_spec[None], state.spec_hist], axis=0
        )  # (B, 4, m, s, bins), most recent first
        h_vec = stacked.transpose(1, 2, 0, 3, 4).reshape(4, -1, sb, r_spec.shape[-1])
    else:
        h_vec = r_spec
    new_cov = jnp.einsum(
        "pmsf,pmtf->pfst", jnp.conj(h_vec), h_vec
    )
    new_cross = jnp.einsum(
        "zmsf,zmf->zfs",
        jnp.conj(h_vec[jnp.asarray([0, 3])]),
        wt_spec,
    )
    if mic_axis is not None:
        new_cov = jax.lax.psum(new_cov, mic_axis)
        new_cross = jax.lax.psum(new_cross, mic_axis)
    cov = forgetting * state.cov + new_cov
    cross = forgetting * state.cross + new_cross

    # ---- leakage-aware bin coupling (config.fd_bin_coupling = C) ------
    # The J-tap truncation below convolves every designed spectrum with
    # the tap window's Dirichlet kernel P(o) = sum_{n<J} e^{-2πi o n/N}:
    # w_proj(f') = (1/N) sum_o P(o) w(f'-o). The realized dark energy at
    # bin f' therefore couples w(f) with weight P(f'-f); holding the
    # neighbors' filters fixed (block-diagonal approximation of the
    # coupled quadratic), the per-bin design problem for w(f) has
    # covariance sum_o |P(o)|^2 R_{f+o} / J^2 and cross vector
    # sum_o conj(P(o)) r_{f+o} / J — i.e. the SAME S x S pencils, with
    # statistics smoothed by the projection's own leakage weights.
    # Edge bins reflect with conjugation: the statistics at a virtual
    # bin m < 0 (or past Nyquist) are those of the real signal's
    # negative-frequency line, R_{-f} = conj(R_f), r_{-f} = conj(r_f)
    # (h_{-f} = conj(h_f) for real inputs), so DC/Nyquist neighborhoods
    # see their true leakage environment instead of zeros.
    cov_d, cross_d = cov, cross
    if config.fd_bin_coupling > 1:
        hw = config.fd_bin_coupling // 2
        nb = config.num_bins
        if hw >= nb:
            raise ValueError(
                f"fd_bin_coupling={config.fd_bin_coupling} spans more "
                f"than the {nb} available bins"
            )
        offs = np.arange(-hw, hw + 1)
        p_o = np.exp(
            -2j
            * np.pi
            * np.outer(offs, np.arange(config.filter_length))
            / block
        ).sum(axis=1)
        w_cov = np.abs(p_o) ** 2 / config.filter_length**2
        w_cross = np.conj(p_o) / config.filter_length
        cov_d = _smooth_bins(cov, w_cov, hw, nb)
        cross_d = _smooth_bins(cross, w_cross, hw, nb)

    # ---- batched per-bin Hermitian GEVD -------------------------------
    # Zone A pencil per bin: (cov[AA], cov[AB]); zone B: (cov[BB], cov[BA]).
    bins = config.num_bins
    a_stack = cov_d[jnp.asarray([0, 3])].reshape(2 * bins, sb, sb)
    b_stack = cov_d[jnp.asarray([1, 2])].reshape(2 * bins, sb, sb)
    if reg is None:
        # Scale-invariant loading relative to each bin's dark energy.
        trace = jnp.einsum("bss->b", b_stack).real / sb
        reg_vec = config.reg_b + 1e-4 * trace
    else:
        reg_vec = jnp.full((2 * bins,), reg)
    eye = jnp.eye(sb, dtype=b_stack.dtype)
    b_loaded = b_stack + reg_vec[:, None, None] * eye
    v_out = config.fd_num_solutions
    if config.fd_span == "full":
        # Low-cost mode: the full-span VAST sum telescopes,
        #   w = sum_i (u_i^H r)/(lam_i + mu) u_i = (A + mu B_loaded)^{-1} r
        # (U^H B_loaded U = I over the full span), so the per-bin design
        # is ONE batched Hermitian-PD Cholesky solve — no eigh at all.
        # Identical math to the 'all' path's last rank (pinned in
        # tests/test_fd_engine.py).
        from apvast_tpu.ops.small_chol import posdef_solve_small

        h = a_stack + jnp.asarray(config.mu, b_loaded.dtype) * b_loaded
        if config.fd_group_size > 1:
            # Group-coupled solve (see _solve_bin_groups): within-group
            # leakage coupling kept exactly instead of block-diagonally.
            g = config.fd_group_size
            q_raw = cov[jnp.asarray([0, 3])] + jnp.asarray(
                config.mu, cov.dtype
            ) * cov[jnp.asarray([1, 2])]
            h_diag = h.reshape(2, bins, sb, sb)
            w = _solve_bin_groups(
                config, h_diag, q_raw, cross_d, p_o, offs, 0
            )
            if config.fd_group_overlap:
                # Half-shifted second partition; keep each bin from the
                # pass that places it nearest a group center (the
                # partition's boundary bins see a one-sided in-group
                # leakage window).
                w1 = _solve_bin_groups(
                    config, h_diag, q_raw, cross_d, p_o, offs, g // 2
                )
                f = np.arange(bins)
                d0 = np.abs((f % g) - (g - 1) / 2)
                d1 = np.abs(((f + g // 2) % g) - (g - 1) / 2)
                use1 = jnp.asarray(d1 < d0)
                w = jnp.where(use1[None, :, None], w1, w)
            w_all = w.reshape(2, bins, 1, sb)
        else:
            # Unrolled tiny-batch Cholesky: jnp.linalg.cholesky's LAPACK-
            # shaped custom call measures 1.39 ms/hop at (1602, 8, 8) on
            # v5e — the most expensive op in the whole FD hop.
            w = posdef_solve_small(h, cross_d.reshape(2 * bins, sb, 1))
            if config.fd_coupled_iters > 0:
                # Exact-coupling refinement toward the GLOBAL Tikhonov-
                # regularized leakage-aware design (see _coupled_refine).
                q_raw = cov[jnp.asarray([0, 3])] + jnp.asarray(
                    config.mu, cov.dtype
                ) * cov[jnp.asarray([1, 2])]
                w = _coupled_refine(
                    config,
                    plan,
                    h.reshape(2, bins, sb, sb),
                    cross,
                    q_raw,
                    reg_vec.reshape(2, bins),
                    w.reshape(2, bins, sb),
                )
            w_all = w.reshape(2, bins, 1, sb)  # (2, bins, V_out=1, sb)
    else:
        if config.fd_eigh == "jacobi" and dtype != jnp.float32:
            raise ValueError(
                "fd_eigh='jacobi' is a float32 kernel — it would silently "
                "degrade a float64 config"
            )
        u, lam = jdiag_hermitian_batched(
            a_stack,
            b_loaded,
            0.0,
            eigh_impl=config.fd_eigh,
            jacobi_sweeps=config.fd_jacobi_sweeps,
            interpret=(jax.default_backend() == "cpu"),
        )
        u = u.reshape(2, bins, sb, sb)
        lam = lam.reshape(2, bins, sb)

        # ---- per-bin variable-span synthesis --------------------------
        # coef_i(f) = (u_i^H r_f) / (lam_i + mu); all ranks via cumsum.
        coef = jnp.einsum("zfsi,zfs->zfi", jnp.conj(u), cross_d) / (
            lam + jnp.asarray(config.mu, dtype=lam.dtype)
        )
        # w ranks: (2, bins, V, s)
        w_all = jnp.cumsum(
            coef[..., :v, None] * u.transpose(0, 1, 3, 2)[:, :, :v, :],
            axis=2,
        )
    zone_gate = jnp.asarray(
        [float(config.run_a), float(config.run_b)], dtype=dtype
    )
    w_all = w_all * zone_gate[:, None, None, None]
    # Warmup guard: with near-zero startup covariance some TPU complex
    # eigensolver paths emit non-finite eigenvectors for degenerate bins
    # (the CPU path does not); silence those bins instead of letting a
    # transient NaN enter the output overlap chain.
    bad_w = ~jnp.isfinite(w_all)
    silenced = jnp.sum(bad_w, dtype=jnp.int32)
    w_all = jnp.where(bad_w, 0, w_all)

    filt_spec = w_all.transpose(0, 2, 3, 1)  # (2, V_out, s*B, bins)
    filt_spec = filt_spec.reshape(2, v_out, b, s, filt_spec.shape[-1])
    # Constrain each frame tap to a J-tap FIR filter (projection:
    # ifft -> truncate -> fft), restoring the time-domain engine's filter
    # structure so the WOLA output path stays alias-free. Under
    # use_matmul_dft both directions are thin MXU contractions against
    # the plan's (bins, J)/(J, bins) projection matrices — on TPU the
    # size-1600 FFT custom call decomposes into dozens of relayout-heavy
    # small ops that dominated the FD hop (PERF.md round-4 breakdown).
    if config.use_matmul_dft:
        re, im = jnp.real(filt_spec), jnp.imag(filt_spec)
        w_time = jnp.einsum(
            "...k,kj->...j", re, plan.proj_idft_cos,
            preferred_element_type=re.dtype,
        ) - jnp.einsum(
            "...k,kj->...j", im, plan.proj_idft_sin,
            preferred_element_type=im.dtype,
        )
        filt_spec = jnp.einsum(
            "...j,jk->...k", w_time, plan.proj_dft_cos,
            preferred_element_type=w_time.dtype,
        ) - 1j * jnp.einsum(
            "...j,jk->...k", w_time, plan.proj_dft_sin,
            preferred_element_type=w_time.dtype,
        )
    else:
        w_time = irfft_batched(filt_spec, block)[..., : config.filter_length]
        filt_spec = rfft_batched(w_time, block)  # (2, V, B, s, bins)

    # ---- output synthesis (same WOLA machinery as the TD engine) ------
    input_blocks = slide(state.input_blocks, hops)
    in_spec = _analyze(config, plan, input_blocks)  # (2, bins)

    # Cross-frame filtering: tap tau applies to the input spectrum of
    # tau frames ago.
    if b > 1:
        in_stack = jnp.concatenate(
            [in_spec[None], state.in_spec_hist], axis=0
        )  # (B, 2, bins), most recent first
        out_spec = jnp.einsum(
            "zvbsf,bzf->zvsf", filt_spec, in_stack
        )
    else:
        out_spec = in_spec[:, None, None, :] * filt_spec[:, :, 0]
    new_out = _synthesize(config, plan, out_spec, block)
    out_overlap, out_emit = wola_overlap_add_tail(
        state.out_overlap, new_out, hop
    )

    t_out_spec = in_spec[:, None, :] * plan.target_filter_spec
    new_t_out = _synthesize(config, plan, t_out_spec, block)
    target_out_overlap, t_emit = wola_overlap_add_tail(
        state.target_out_overlap, new_t_out, hop
    )

    out_vhs = out_emit.transpose(0, 1, 3, 2)
    t_vhs = t_emit.transpose(0, 2, 1)  # (2, hop, s): single target copy

    new_state = FdState(
        conv_history=conv_history,
        resp=slide_tail(resp[0], resp[1], hop),
        target_resp=slide_tail(target_resp[0], target_resp[1], hop),
        input_blocks=input_blocks,
        out_overlap=out_overlap,
        target_out_overlap=target_out_overlap,
        cov=cov,
        cross=cross,
        spec_hist=(
            jnp.concatenate([r_spec[None], state.spec_hist[:-1]], axis=0)
            if b > 1
            else None
        ),
        in_spec_hist=(
            jnp.concatenate([in_spec[None], state.in_spec_hist[:-1]], axis=0)
            if b > 1
            else None
        ),
    )
    outputs = HopOutputs(
        out_a=out_vhs[0] if config.run_a else None,
        out_b=out_vhs[1] if config.run_b else None,
        out_a_t=t_vhs[0],
        out_b_t=t_vhs[1],
        silenced=silenced,
    )
    return new_state, outputs
