"""Static configuration for the AP-VAST TPU engine.

Covers the constructor parameter surface of the reference engines
(Python/apvast.py:40-56 — 15 keyword parameters — and
Matlab/ControlMethods/apVast.m:94-141 — 13 positional parameters) plus the
behavioral toggles that the reference hides in module-level booleans
(Python/apvast.py:6-7) and commented-out alternates
(Matlab/ControlMethods/apVast.m:400-405, perceptualModel.m:41-42).

Where the two reference implementations disagree, the variant enums below
select between them; defaults follow ``Python/apvast.py`` because that is
the parity target fixed by BASELINE.json.

The dataclass is frozen and hashable so it can be a ``jax.jit`` static
argument: all array shapes inside the engine derive from it.
"""

from __future__ import annotations

import dataclasses
import enum


class ToeplitzVariant(enum.Enum):
    """How statistics frames are read out of the weighted-response buffers.

    PYTHON reproduces the scipy ``toeplitz(c, r)`` corner override in the
    reference (Python/apvast.py:336-338): scipy overwrites ``r[0]`` with
    ``c[0]``, so every frame *skips* the buffer sample at index
    ``filter_length`` and there are ``N - J`` frames.

    MATLAB reproduces Matlab/ControlMethods/apVast.m:422: contiguous
    frames, ``N - J + 1`` of them, no skipped sample.
    """

    PYTHON = "python"
    MATLAB = "matlab"


class RegularizationVariant(enum.Enum):
    """Where diagonal loading is applied before the joint diagonalization.

    PYTHON: load only the dark-zone matrix B inside jdiag with a fixed
    ``reg_b * I`` (Python/apvast.py:22-24 with
    EXPERIMENTAL_REGULARIZATION=True).

    PYTHON_NORM: the reference's inactive alternative
    (Python/apvast.py:25-27): ``1e-8 * ||B||_2 * I`` on B only.

    MATLAB: load both matrices before jdiag with norm-scaled terms —
    bright ``1e-8 * ||R||`` and dark ``5e-3 * ||R||``
    (Matlab/ControlMethods/apVast.m:552-569).
    """

    PYTHON = "python"
    PYTHON_NORM = "python_norm"
    MATLAB = "matlab"


class WeightingNorm(enum.Enum):
    """Normalization of the perceptual weighting curve per microphone.

    UNIT_ONESIDED: divide the one-sided gain vector by its 2-norm
    (Python/apvast.py:322-324 with EXPERIMENTAL_NORMALIZE_GAINS=True).

    UNIT_SYMMETRIC: divide by the 2-norm of the full-length symmetric
    curve (Matlab/ControlMethods/perceptualModel.m:177-190, selected at
    apVast.m:400-404).

    PRESSURE: scale by 20e-6 so the curve is centered around 1 instead of
    20 uPa (perceptualModel.m:162-175, the commented-out MATLAB variant).

    NONE: raw gains.
    """

    UNIT_ONESIDED = "unit_onesided"
    UNIT_SYMMETRIC = "unit_symmetric"
    PRESSURE = "pressure"
    NONE = "none"


class TargetFilterVariant(enum.Enum):
    """Which delta filter produces the target (reference) playback path.

    SHARED_A: one target filter built from ``reference_index_a`` and used
    for both zones (Python/apvast.py:389-390,418,422).

    PER_ZONE: separate zone filters from each zone's own reference index
    (Matlab/ControlMethods/apVast.m:597-602).
    """

    SHARED_A = "shared_a"
    PER_ZONE = "per_zone"


class GevdSolver(enum.Enum):
    """How the per-hop generalized eigenproblem is solved.

    EIGH: exact dense eigendecomposition after Cholesky whitening — the
    reference-faithful path (parity mode; also the only choice when all
    JL eigenpairs are required, e.g. output_spans up to JL).

    SUBSPACE: blocked subspace iteration for the top
    num_eigenvectors (+ oversampling) pairs — MXU-native, several times
    faster at JL >= several hundred, acoustically indistinguishable on
    the bundled scene (see ops/jdiag.jdiag_topk).
    """

    EIGH = "eigh"
    SUBSPACE = "subspace"


class ThresholdMethod(enum.Enum):
    """Threshold-of-hearing curve for the perceptual model
    (Matlab/ControlMethods/interpolatedThresholdOfHearing.m:11-21)."""

    ISO226_2003 = "iso226_2003"
    PAINTER_2000 = "painter_2000"
    NONE = "none"


class PerceptualFrontend(enum.Enum):
    """Which perceptual front-end parameterization weights the spectra.

    MATLAB_MODEL: the in-repo van de Par model exactly as
    Matlab/ControlMethods/perceptualModel.m builds it — 1-ERB-spaced
    gammatone channels (count = floor(ERB(Fs/2)) + 1), selectable
    threshold-of-hearing curve, absolute dB-SPL calibration via
    ``pressure_scale_db_spl``.

    LIBDETECTABILITY: the parameterization of the external package the
    Python reference wires in (Python/apvast.py:4,77-83):
    ``perceptual_taps`` (default 32) *fixed* gammatone channels spread
    uniformly on the ERB scale, the Terhardt/Painter-2000 closed-form
    threshold, and ``relax_threshold=True`` semantics — the absolute
    dbspl/spl mapping is ignored (the reference's own comment) and the
    model is referenced to the threshold-curve minimum instead. The
    package itself is unavailable offline (survey §6), so this variant is
    reconstructed from the van de Par (2005) equations + the package's
    documented constructor surface; see
    perceptual/tables.build_libdetectability_tables.
    """

    MATLAB_MODEL = "matlab_model"
    LIBDETECTABILITY = "libdetectability"


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclasses.dataclass(frozen=True)
class ApVastConfig:
    """Hashable, jit-static description of an AP-VAST processing scene."""

    # Scene geometry (static shapes; reference reads them off the RIR
    # arrays at Python/apvast.py:97-99).
    rir_length: int
    num_srcs: int
    num_mics: int

    # WOLA / filter-design parameters (Python/apvast.py:40-56).
    block_size: int = 1600
    filter_length: int = 100
    modeling_delay: int = 20
    reference_index_a: int = 0
    reference_index_b: int = 0
    num_eigenvectors: int = 1
    mu: float = 1.0
    statistics_buffer_length: int = 1000
    hop_size: int | None = None
    sampling_rate: int = 48000
    run_a: bool = True
    run_b: bool = True
    perceptual: bool = True

    # Numerics.
    dtype: str = "float64"
    # Behavioral variants (defaults = Python/apvast.py semantics).
    toeplitz_variant: ToeplitzVariant = ToeplitzVariant.PYTHON
    regularization: RegularizationVariant = RegularizationVariant.PYTHON
    reg_b: float = 1e-7  # Python/apvast.py:23
    # Extra scale-relative loading of the dark matrix: reg_b is ABSOLUTE
    # (the reference's constant) and becomes vanishingly small relative to
    # scenes whose covariance scale is large — float32 Cholesky then fails
    # (survey §7 'numerical conditioning'). None = AUTO: 1e-6 for float32
    # production, 0 for float64 parity mode. Set 0.0 explicitly to force
    # reference-exact loading even in float32.
    reg_b_relative: float | None = None
    bright_loading: float = 1e-8  # Matlab/ControlMethods/apVast.m:556
    dark_loading: float = 5e-3  # Matlab/ControlMethods/apVast.m:555
    normalize_statistics: bool = False  # True => apVast.m:448-456 scaling
    weighting_norm: WeightingNorm = WeightingNorm.UNIT_ONESIDED
    target_filter: TargetFilterVariant = TargetFilterVariant.SHARED_A
    threshold_method: ThresholdMethod = ThresholdMethod.ISO226_2003
    # Perceptual front-end parameterization (see PerceptualFrontend); the
    # taps count only applies to the LIBDETECTABILITY variant
    # (Python/apvast.py:79 passes taps=32). NOTE: LIBDETECTABILITY
    # faithfully reproduces the package's semantics, so it IGNORES
    # ``threshold_method`` and ``pressure_scale_db_spl`` — the package
    # hardwires the Terhardt/Painter-2000 threshold referenced to the
    # curve minimum (relax_threshold=True, Python/apvast.py:80-83).
    #
    # DELIBERATE deviation from the defaults-follow-Python rule: the
    # Python parity target's perceptual path IS libdetectability
    # (Python/apvast.py:4), but that package is unavailable offline, so
    # the LIBDETECTABILITY variant here is a reconstruction whose exact
    # numerical equality with the package cannot be verified (survey §6);
    # MATLAB_MODEL is the reference's own in-repo van de Par math,
    # validated line for line against perceptualModel.m and the paper's
    # Fig. 2b. The default is therefore the *verifiable* front-end; set
    # perceptual_frontend=LIBDETECTABILITY for Python-reference
    # parameterization semantics.
    perceptual_frontend: PerceptualFrontend = PerceptualFrontend.MATLAB_MODEL
    perceptual_taps: int = 32
    # GEVD solver selection (see GevdSolver).
    gevd_solver: GevdSolver = GevdSolver.EIGH
    # SUBSPACE solver: extra subspace columns beyond num_eigenvectors, and
    # power-iteration count per hop. The subspace is carried across hops
    # (warm start), so a modest per-hop count converges after the normal
    # stream warmup.
    subspace_oversample: int = 30
    subspace_iters: int = 3
    # Orthogonalization inside the subspace iteration: "qr" (Householder)
    # or "cholqr2" (matmul-only CholeskyQR2 — MXU-friendly).
    subspace_orth: str = "cholqr2"
    # Whitening: "solve" (triangular solves per application), "invert"
    # (one blocked matmul-only triangular inversion per hop; see
    # ops/trisolve.py), or "newton" (a carried Newton-Schulz approximate
    # inverse of the dark matrix, refreshed matmul-only per hop and
    # rebuilt from a fresh Cholesky when its residual degrades; exact
    # statistics still set the extraction via a projected-pencil
    # Rayleigh-Ritz; ops/jdiag.jdiag_topk_pencil_batched). MEASURED
    # caveat: at the default hop = statistics_buffer/1.25 turnover the
    # windowed statistics change ~80% per hop and the carried inverse's
    # residual lands at 15-30 every hop — the rebuild branch always
    # fires, making "newton" equivalent to "invert" plus one wasted
    # n^3 residual matmul. It only pays for small-hop / long-buffer
    # streaming configs (hop << statistics_buffer_length). A
    # stale-preconditioner variant (rebuild every T hops) was measured
    # on recorded north-star pencils and rejected: rank-1 filter error
    # 0.05-0.14 vs 1e-4 for per-hop factorization (sample-noise B
    # fluctuations rotate the iteration operator's invariant subspace).
    # "tracking" (round 4): no per-hop (JL, JL) factorization at all —
    # a carried inverse Cholesky factor acts as a PRECONDITIONER for
    # LOBPCG-style Rayleigh-Ritz tracking on the exact pencil
    # (ops/jdiag.jdiag_topk_tracked), refreshed every
    # tracking_rebuild_period hops plus a tracking_warmup_hops window of
    # per-hop rebuilds while the statistics buffer turns over its noise
    # init. Unlike 'newton' (whose stale operator rotates the iteration's
    # invariant subspace — see below), staleness here only slows the
    # tracking rate: the extraction is an exact-pencil Rayleigh-Ritz.
    subspace_whiten: str = "invert"
    # Tracking-whitening knobs (subspace_whiten="tracking").
    tracking_outer_steps: int = 2
    tracking_rebuild_period: int = 4
    tracking_warmup_hops: int = 4
    # Carry the tracking preconditioner Li in bfloat16 (float32 configs
    # only): Li is a PRECONDITIONER, never a correctness input — the
    # Rayleigh-Ritz solve is on the exact pencil — so half-precision
    # halves the (2, jl, jl) carry's HBM traffic (the scan-carry copies
    # and the rebuild cond's select are ~20 MB each at JL=1600) and
    # speeds the per-hop M r application matmuls.
    tracking_li_bf16: bool = False
    # Matmul precision of the tracking solver's RESIDUAL path (the
    # aq/bq/p products that steer the preconditioned basis expansion):
    # "high" = 3-pass bf16 (exact-ish f32), "default" = single-pass
    # bf16. The Rayleigh-Ritz matrices are always recomputed on the
    # exact pencil at full precision, so the residual path tolerates
    # the cheap mode — quality-gated on the 32-speaker scene
    # (tools/tracking_gate.py).
    tracking_residual_precision: str = "high"
    # Residual-triggered rebuild fallback: when > 0, a hop whose carried
    # relative Ritz residual (computed for free inside the tracked
    # solver from the previous hop) exceeds this threshold forces a
    # preconditioner rebuild even between the fixed-cadence hops — the
    # guard against nonstationary program material going stale between
    # rebuilds (level steps, silence-to-signal transitions). 0 disables.
    # Steady-state residuals measure ~1e-2..1e-1 on noise at T16; the
    # blessed production value comes from tools/tracking_gate.py.
    tracking_residual_rebuild: float = 0.0
    # Rayleigh-Ritz basis handling: "cholqr2" orthonormalizes the
    # doubled basis [q, p]; "direct" Rayleigh-Ritzes the raw basis
    # (the generalized solve Cholesky-whitens bbar, so orthonormality
    # is unnecessary) — reuses aq/bq as the first k columns of the RR
    # products, saving the CholeskyQR2 pass and 1/3 of the solver's
    # (n, n) x (n, k) matmul budget. Quality-gated at 32 speakers.
    tracking_rr_basis: str = "cholqr2"
    # HALF-FORM covariance hand-off (round 5): the skew statistics
    # kernel emits M with R = M + M^T (garbage upper-tap lanes zeroed,
    # tap-diagonal halved in-kernel) and the tracking solver applies
    # M x + M^T x via transposed-contraction dot_generals — the
    # symmetric completion's transpose + mask-select pass over the
    # (4, SJ, SJ) stack (~215 MB HBM/hop at SJ=1600) never runs in the
    # steady-state hop; the full dark matrix is materialized only
    # inside the preconditioner rebuild branch. Requires the skew lag
    # statistics path, the tracking solver, and PYTHON regularization
    # (the norm-based loading variants need the completed matrix).
    statistics_half_form: bool = False
    # Rayleigh-Ritz eigensolver for the SUBSPACE solver's small projected
    # matrix: "lapack" (XLA eigh custom call) or "jacobi" (one fused
    # Pallas cyclic-Jacobi kernel, float32 production — the custom call
    # is latency-bound at k ~ 56 and dominates the solver otherwise).
    small_eigh: str = "lapack"
    # Jacobi sweeps per hop; the warm-started Rayleigh-Ritz matrix is
    # near-diagonal in steady state, so a low count converges (cold
    # start needs ~8-10 at k = 56 — covered by the stream warmup).
    jacobi_sweeps: int = 4
    # Run the whitened power steps + CholeskyQR2 + Rayleigh-Ritz
    # projection as ONE fused Pallas kernel (ops/pallas/subspace) —
    # float32 production only; requires subspace_whiten='invert',
    # subspace_orth='cholqr2' and subspace_rank % 8 == 0.
    use_pallas_subspace: bool = False
    # Compute the 'invert' whitening setup (Cholesky + triangular
    # inversion of the loaded dark matrices) as ONE fused Pallas kernel
    # (ops/pallas/whiten.py) instead of XLA's panelized custom-call
    # chain (~350 us/hop of dispatch latency on the north-star trace).
    # float32 production only; requires subspace_whiten='invert' and
    # jl <= 1024 (the kernel is VMEM-resident) — the engine falls back
    # to the XLA chain outside those bounds.
    use_pallas_whiten: bool = False
    # Use the fused Pallas framing+covariance kernel for the statistics
    # (float32 only; frames never materialized, cross-correlation vector
    # via FFT). Falls back to interpret mode off-TPU.
    use_pallas_statistics: bool = False
    # Compute the statistics from lag correlations instead of a dense
    # Gram (ops/lag_statistics.py): exploits the Toeplitz shift structure
    # of the data matrix for ~J-fold fewer FLOPs — same sums, different
    # order. Takes precedence over use_pallas_statistics. Any dtype.
    use_lag_statistics: bool = False
    # How the lag tables become the (SJ, SJ) matrices (only meaningful
    # when use_lag_statistics is True):
    #  - "wide" (default): tap-major assembly — two wide row-linear
    #    shears + one MXU matmul-cumsum — then ONE 4-D transpose back to
    #    source-major ordering, so the solver sees the same entry values
    #    in the same ordering the per-pair path is validated on.
    #  - "pair": source-major per-source-pair diagonal shears (S^2 small
    #    sub-128-lane relayouts; ~1.4 ms/hop at SJ=1600).
    #  - "tap": tap-major assembly AND tap-major output ordering (filters
    #    extracted with the matching (J, S) reshape). Fastest of the
    #    XLA assemblies, but the symmetrically-permuted pencil's
    #    different Cholesky rounding measurably rotates a near-degenerate
    #    top eigenpair on the north-star scene (rank-1 contrast delta
    #    0.43 dB vs 0.08 dB source-major — outside the 0.25 dB gate).
    #  - "skew": the assembly fused into one scanned Pallas MXU kernel
    #    (ops/pallas/skew_assembly.py) writing source-major rows
    #    directly — no wide relayout passes at all (float32 kernel;
    #    interpret-mode off TPU).
    lag_assembly: str = "wide"
    # Apply the perceptual weighting to the loudspeaker responses as a
    # truncated time-domain circular convolution (ops/weighting_conv.py)
    # instead of the full spectral round trip — an APPROXIMATION (the
    # weighting impulse response is truncated to this many taps, odd;
    # production only, quality-gated). None = exact reference path.
    weighting_conv_taps: int | None = None
    # Frequency-domain engine only: per-bin filters span this many STFT
    # frames (cross-frame taps). 1 = the classic per-bin formulation,
    # whose contrast ceiling is structurally rank <= num_srcs per bin;
    # B > 1 lifts the per-bin rank ceiling to num_srcs * B at
    # O((S B)^3)-per-bin solver cost.
    fd_frame_taps: int = 1
    # Frequency-domain engine only: leakage-aware per-bin design. The
    # J-tap truncation projection (fd_hop: ifft -> truncate -> fft)
    # convolves every designed filter spectrum with the tap window's
    # Dirichlet kernel D, so a filter "at bin f" also acts on its
    # neighbors' content — the per-bin-independent design never sees
    # that realized dark leakage (one structural half of the FD
    # engine's ~15 dB contrast ceiling, PERF.md). With coupling C > 1
    # each bin's pencil uses statistics smoothed over (C-1)/2 neighbor
    # bins with the projection's own weights (|D(o)|^2 for the
    # covariances, D(o) for the cross vector) — the block-diagonal
    # approximation of the truncation-coupled quadratic, at UNCHANGED
    # S x S solver cost. Odd; 1 = classic per-bin design.
    fd_bin_coupling: int = 1
    # Frequency-domain engine only: per-bin Hermitian eigensolver.
    # "lapack" = XLA's batched complex eigh custom call — measured
    # ~2.7 ms/hop of the FD hop's ~3.2 ms at (1602, 8, 8) bins on the
    # TPU trace (QR-iteration while loops + sort); "jacobi" = one real
    # Pallas cyclic-Jacobi kernel over the symmetric 2S x 2S embedding
    # of every bin's whitened pencil (ops/pallas/jacobi_eigh.
    # jacobi_eigh_hermitian). float32 production only.
    fd_eigh: str = "lapack"
    # Jacobi sweep count for fd_eigh="jacobi". The FD pencils are
    # whitened fresh each hop (no warm start), so this is a cold-start
    # count: quality-gated at 6 on the bundled scene.
    fd_jacobi_sweeps: int = 6
    # Frequency-domain engine only: which spans to synthesize.
    # "all" = every cumulative rank 1..V per bin (the reference's
    # all-ranks contract, Python/apvast.py:406-422) — requires the
    # per-bin eigendecomposition. "full" = ONLY the full span
    # (num_eigenvectors == num_srcs * fd_frame_taps), for which the VAST
    # sum telescopes to w = (A + mu * B_loaded)^{-1} r — one batched
    # S x S Cholesky solve per bin, NO eigendecomposition. This is the
    # FD engine's low-cost mode: the batched complex eigh is ~2.7 ms of
    # the 3.2 ms FD hop on TPU, and the full span is the NMSE-optimal
    # end of the trade-off — exactly what the FD engine is for.
    fd_span: str = "all"
    # Frequency-domain engine only, with fd_span="full": solve the
    # leakage-coupled design JOINTLY over groups of this many adjacent
    # bins instead of bin-by-bin. fd_bin_coupling's smoothed statistics
    # are the BLOCK-DIAGONAL approximation of the truncation-coupled
    # quadratic (each bin holds its neighbors' filters fixed); a group
    # solve keeps every cross-bin coupling term C_{fg} =
    # sum_o conj(P(o)) P(o + f - g) R_{f+o} / J^2 inside the group, so
    # within-group leakage is optimized exactly. Cost: batched
    # (G*S*B)^2 Cholesky solves over bins/G groups per zone instead of
    # (S*B)^2 over every bin. 1 = the per-bin smoothed design.
    fd_group_size: int = 1
    # With fd_span="full": number of exact-coupling refinement
    # iterations (engine/fd_hop._coupled_refine). Damped Richardson
    # iteration on the GLOBAL Tikhonov-regularized leakage-coupled
    # normal equations (K^adj (A + mu B) K + mu reg I) w = K^adj r,
    # preconditioned by the per-bin smoothed pencils; K (the J-tap
    # truncation projection) is applied exactly via two thin matmul-DFT
    # contractions per iteration, so unlike fd_bin_coupling (bin-
    # diagonal only) and fd_group_size (hard group boundaries) every
    # cross-bin coupling term is seen. 0 = the per-bin smoothed design.
    fd_coupled_iters: int = 0
    # Richardson relaxation factor for fd_coupled_iters.
    fd_coupled_relax: float = 0.5
    # Iteration scheme for fd_coupled_iters: "cg" (preconditioned CG —
    # monotone in the operator's energy norm, the only stable choice:
    # the coupling operator's off-diagonal row mass is ~block/J times
    # its diagonal, so "richardson" damped fixed-point iteration
    # diverges; kept for the measured negative result).
    fd_coupled_method: str = "cg"
    # With fd_group_size > 1: relative eigenvalue cutoff for a
    # truncated-pseudo-inverse group solve. The J-tap projection makes
    # adjacent bins within the Dirichlet coherence width (block/J bins)
    # nearly collinear, so the group quadratic is singular to working
    # precision: a plain solve fills its near-null space with content
    # the WITHIN-group model deems free but which leaks across group
    # boundaries as enormous realized filters (measured: NMSE 10^2-10^5,
    # contrast ~0). Eigenvalues below tol * lambda_max are truncated
    # (solution restricted to the leakage-significant subspace).
    # 0 = plain Cholesky/LU solve (only safe for G = 1).
    fd_group_rank_tol: float = 0.0
    # With fd_group_size > 1: also run a half-group-shifted pass and
    # keep each bin's solution from whichever pass places it nearest a
    # group CENTER — removes the partition's group-boundary bins (whose
    # in-group leakage window is one-sided) at 2x solver cost.
    fd_group_overlap: bool = False
    # Synthesize outputs with the Pallas circular-convolution matmul
    # kernel instead of per-rank FFTs (float32 only; exact same math —
    # the J-tap filters make circular convolution one MXU contraction).
    use_pallas_output: bool = False
    # Run the stage-1 streaming RIR convolution as a Pallas windows-matmul
    # instead of overlap-save FFTs (float32 only; incompatible with mic
    # sharding because the kernel stack folds the mic axis into rows).
    use_pallas_conv: bool = False
    # Evaluate the WOLA analysis/synthesis transforms as DFT matmuls on
    # the MXU instead of FFT custom-calls (float32 production only: the
    # O(N) matmul-DFT rounding is ~1e-4 relative at N=1600, well inside
    # float32 engine tolerances but not parity-grade).
    use_matmul_dft: bool = False
    # MATLAB-style multi-solution mode (apVast.m:113-120): when set, the
    # engine still diagonalizes with num_eigenvectors = max(output_spans)
    # but synthesizes outputs only for these span ranks (1-based), instead
    # of the Python engine's one-output-per-rank-1..V contract.
    output_spans: tuple[int, ...] | None = None
    # 0 dBFS <-> this many dB SPL (Matlab/main.m:44 uses 94).
    pressure_scale_db_spl: float = 94.0
    # Scale of the deterministic noise init of the response buffers
    # (Python/apvast.py:122-129 uses unseeded 1e-3*randn; here the noise is
    # drawn from an explicit PRNG key at init_state time).
    noise_init_scale: float = 1e-3

    def __post_init__(self) -> None:
        if self.block_size % 2 != 0:
            raise ValueError("block_size must be even")  # apvast.py:86-87
        if self.hop_size is not None and not 0 < self.hop_size <= self.block_size:
            raise ValueError("hop_size must lie in (0, block_size]")
        if self.statistics_buffer_length <= self.filter_length:
            raise ValueError(
                "statistics_buffer_length must exceed filter_length"
            )
        # hop > statistics_buffer_length is VALID (a statistics window
        # shorter than one hop — each update sees only the most recent
        # window; ops/wola.slide preserves the configured length), so no
        # constraint between the two is enforced.
        if not 0 <= self.modeling_delay < self.filter_length:
            # The reference would place the target-filter delta into the
            # next source's coefficient block (flat index J*ref + delay,
            # apvast.py:390) — pathological; reject it up front.
            raise ValueError("modeling_delay must lie in [0, filter_length)")
        if not 0 <= self.reference_index_a < self.num_srcs:
            raise ValueError("reference_index_a out of range")
        if not 0 <= self.reference_index_b < self.num_srcs:
            raise ValueError("reference_index_b out of range")
        if self.num_eigenvectors > self.filter_length * self.num_srcs:
            raise ValueError("num_eigenvectors exceeds JL")
        if self.weighting_conv_taps is not None:
            t = self.weighting_conv_taps
            if t % 2 != 1 or not 0 < t < self.block_size:
                raise ValueError(
                    "weighting_conv_taps must be odd and in (0, block_size)"
                )
        if self.subspace_whiten not in (
            "solve", "invert", "newton", "tracking"
        ):
            raise ValueError(
                "subspace_whiten must be one of 'solve', 'invert', "
                "'newton', 'tracking'"
            )
        if self.tracking_rebuild_period < 1:
            raise ValueError("tracking_rebuild_period must be >= 1")
        if self.tracking_li_bf16 and self.dtype != "float32":
            raise ValueError(
                "tracking_li_bf16 is a float32-production knob — it "
                "would silently degrade a float64 parity config"
            )
        if self.tracking_rr_basis not in ("cholqr2", "direct"):
            raise ValueError(
                "tracking_rr_basis must be 'cholqr2' or 'direct'"
            )
        if self.tracking_residual_precision not in ("high", "default"):
            raise ValueError(
                "tracking_residual_precision must be 'high' or 'default'"
            )
        if (
            self.tracking_residual_precision == "default"
            and self.dtype != "float32"
        ):
            raise ValueError(
                "tracking_residual_precision='default' is a float32-"
                "production knob — it would silently degrade a float64 "
                "parity config"
            )
        if self.tracking_outer_steps < 1:
            raise ValueError("tracking_outer_steps must be >= 1")
        if self.tracking_residual_rebuild < 0:
            raise ValueError("tracking_residual_rebuild must be >= 0")
        if self.lag_assembly not in ("wide", "pair", "tap", "skew"):
            # Otherwise a typo surfaces as a bare KeyError inside the
            # jitted hop's assembly dispatch (engine/hop.py).
            raise ValueError(
                "lag_assembly must be one of 'wide', 'pair', 'tap', 'skew'"
            )
        # statistics_half_form composes as a best-effort representation
        # toggle: the engine applies it only when the full pipeline
        # supports it (skew lag statistics feeding the tracking solver)
        # and silently falls back to completed matrices otherwise — so
        # production_overrides stays composable with solver overrides
        # (e.g. the exact-eigh quality oracle). The one hard error
        # (non-PYTHON regularization with an ACTIVE half form) is
        # raised by the engine at trace time.
        if self.fd_frame_taps < 1:
            raise ValueError("fd_frame_taps must be >= 1")
        if self.fd_bin_coupling < 1 or self.fd_bin_coupling % 2 != 1:
            raise ValueError("fd_bin_coupling must be odd and >= 1")
        if self.fd_span not in ("all", "full"):
            raise ValueError("fd_span must be 'all' or 'full'")
        if self.fd_group_size < 1:
            raise ValueError("fd_group_size must be >= 1")
        if self.fd_coupled_iters < 0:
            raise ValueError("fd_coupled_iters must be >= 0")
        if self.fd_coupled_iters > 0:
            if self.fd_span != "full":
                raise ValueError(
                    "fd_coupled_iters refines the full-span solution — "
                    "it requires fd_span='full'"
                )
            if self.fd_group_size > 1:
                raise ValueError(
                    "fd_coupled_iters and fd_group_size are alternative "
                    "coupled formulations — enable only one"
                )
        if not 0.0 < self.fd_coupled_relax <= 1.0:
            raise ValueError("fd_coupled_relax must be in (0, 1]")
        if self.fd_coupled_method not in ("cg", "richardson"):
            raise ValueError("fd_coupled_method must be 'cg' or 'richardson'")
        if self.fd_group_size > 1:
            if self.fd_span != "full":
                raise ValueError(
                    "fd_group_size > 1 is the group-coupled full-span "
                    "solve — it requires fd_span='full' (the variable-"
                    "span 'all' path has no group formulation)"
                )
            if self.fd_bin_coupling <= 1:
                raise ValueError(
                    "fd_group_size > 1 needs fd_bin_coupling > 1: the "
                    "coupling window is the leakage sum the group blocks "
                    "are built from"
                )
        if self.output_spans is not None:
            if len(self.output_spans) == 0:
                raise ValueError("output_spans must be non-empty")
            if any(
                not 1 <= v <= self.num_eigenvectors for v in self.output_spans
            ):
                raise ValueError(
                    "output_spans entries must lie in [1, num_eigenvectors]"
                )

    # ---- derived static quantities -------------------------------------

    @property
    def hop(self) -> int:
        """Effective hop size (Python/apvast.py:93)."""
        return self.hop_size if self.hop_size is not None else self.block_size // 2

    @property
    def carried_deleted_statistics(self) -> bool:
        """Whether the state carries the statistics buffer in sample-J-
        DELETED form (engine/hop.py stage 4): PYTHON Toeplitz variant,
        the deleted sample slides out of the window before the next hop
        (hop > J), AND the deleted-form concatenation's slice sources
        exist (hop + J <= statistics_buffer_length — for larger hops the
        first J samples of the slid buffer extend into the fresh emit,
        so the general slide-then-delete path must run instead).
        Single source of truth for init_state and process_hop."""
        return (
            self.toeplitz_variant is ToeplitzVariant.PYTHON
            and self.hop > self.filter_length
            and self.hop + self.filter_length <= self.statistics_buffer_length
        )

    @property
    def effective_reg_b_relative(self) -> float:
        """Scale-relative dark-matrix loading actually applied: the AUTO
        default keeps float64 reference-exact and protects float32 from
        Cholesky failure on large-magnitude scenes (VERDICT round-1 weak
        #5 — the constant used to be manual per-scene tuning)."""
        if self.reg_b_relative is not None:
            return self.reg_b_relative
        return 1e-6 if self.dtype == "float32" else 0.0

    @property
    def num_bins(self) -> int:
        """One-sided WOLA spectrum length."""
        return self.block_size // 2 + 1

    @property
    def jl(self) -> int:
        """Dimension of the spatial correlation matrices (J * L)."""
        return self.filter_length * self.num_srcs

    @property
    def subspace_rank(self) -> int:
        """Columns of the iterated subspace (SUBSPACE solver)."""
        return min(self.num_eigenvectors + self.subspace_oversample, self.jl)

    @property
    def num_solutions(self) -> int:
        """Leading output axis: span count (MATLAB mode) or V (Python
        all-ranks mode)."""
        return (
            len(self.output_spans)
            if self.output_spans is not None
            else self.num_eigenvectors
        )

    @property
    def fd_num_solutions(self) -> int:
        """Leading output-rank axis of the FD engine: 1 in the full-span
        low-cost mode, else every cumulative rank 1..V."""
        return 1 if self.fd_span == "full" else self.num_eigenvectors

    @property
    def num_frames(self) -> int:
        """Columns of the statistics data matrix Y (see ToeplitzVariant)."""
        n, j = self.statistics_buffer_length, self.filter_length
        return n - j if self.toeplitz_variant is ToeplitzVariant.PYTHON else n - j + 1

    @property
    def fir_fft_size(self) -> int:
        """FFT length for the streaming overlap-save RIR convolution."""
        return _next_pow2(self.rir_length + self.hop - 1)

    @property
    def fir_history(self) -> int:
        """Carried input-history length for the RIR convolution."""
        return self.fir_fft_size - self.hop

    @classmethod
    def for_rirs(cls, rir_a, rir_b, **kwargs) -> "ApVastConfig":
        """Build a config whose scene geometry matches a RIR pair with the
        reference layout ``(rir_length, num_srcs, num_mics)``
        (Python/apvast.py:97-99)."""
        if rir_a.shape != rir_b.shape:
            raise ValueError("rirs of unequal size")  # apvast.py:89-90
        rl, ns, nm = rir_a.shape
        return cls(rir_length=rl, num_srcs=ns, num_mics=nm, **kwargs)


def production_overrides(device: str = "tpu") -> dict:
    """The blessed float32 production configuration — the single source
    of truth for bench.py's headline engine and every perf tool.

    Performance mode: warm-started top-V subspace GEVD (validated
    contrast-exact vs the reference solver at every rank,
    tests/test_subspace_solver.py) + fused Pallas kernels + the Pallas
    cyclic-Jacobi Rayleigh-Ritz eigensolver. Off-TPU the Pallas/matmul
    data paths fall back to the XLA equivalents (interpret-mode kernels
    prove exactness; they are not fast on CPU).
    """
    on_tpu = device == "tpu"
    return dict(
        dtype="float32",
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_oversample=14,
        subspace_iters=2,
        # Whitening: TRACKING (round 4) — no per-hop (JL, JL) Cholesky/
        # triangular inversion; a carried inverse factor preconditions
        # LOBPCG-style exact-pencil Rayleigh-Ritz tracking, rebuilt every
        # 8 hops (+6 warmup hops). Measured on TPU (tools/tracking_gate.py,
        # 32-spk 16-hop contrast vs exact dense eigh): tracking s1
        # -0.15 dB / s2 +0.02 dB where the round-3 'invert' production
        # solver reads -4.6 dB on the same horizon (its cold-start power
        # iteration converges far slower than exact Rayleigh-Ritz);
        # engine hop 3.49 -> 2.75 ms at 32 speakers. Batched serving
        # keeps the tracking solver too (round 4): run_multi_stream /
        # sharded_multi_scene_hop compute the rebuild cadence OUTSIDE
        # vmap as an unbatched scalar, so the cond survives batching
        # (a batched predicate would lower to a select that pays the
        # (jl, jl) factorization every hop for every stream).
        subspace_whiten="tracking" if on_tpu else "invert",
        tracking_outer_steps=1,
        # T32 + direct RR basis + residual-triggered rebuild fallback
        # (round 5). Gated at 32 speakers vs exact eigh
        # (tools/tracking_gate.py, 64 hops = 2 full periods):
        # c1 +0.078 / cV -0.023 dB; sustained 128-hop A/B
        # (tools/halfform_ab.py): T16 2.130 -> T32+r2.5 2.055 ms/hop
        # (RTF 8.11x). The residual threshold 2.5 comes from
        # tools/resid_profile.py: the stationary Ritz-residual band is
        # 0.6-1.4 (occasional 2.0) while a +20 dB program level step
        # spikes it to ~3.1 — so the fallback rebuilds on genuine
        # nonstationarity but never on stationary material (measured:
        # identical hops and quality to plain T32 on white noise;
        # threshold 0.35 degenerated to rebuild-every-hop at
        # 3.25 ms/hop). Long-horizon nonstationarity evidence:
        # tools/tracking_horizon.py.
        tracking_rebuild_period=32,
        tracking_warmup_hops=6,
        tracking_rr_basis="direct",
        tracking_residual_rebuild=2.5,
        # Statistics: skew-assembly lag engine (round 3) — the Toeplitz
        # structure cuts the covariance FLOPs ~J-fold and the fused
        # Pallas assembly removes the relayout passes. Measured
        # (tools/r3_matrix.py, TPU): north-star 1.67 -> 1.39 ms/hop,
        # 32-spk 5.52 -> 3.65 ms/hop vs the dense Pallas Gram kernel.
        # The engine falls back to the dense kernel when the source
        # count is not a multiple of 8 (Mosaic sublane alignment).
        use_lag_statistics=on_tpu,
        lag_assembly="skew",
        # Half-form hand-off (round 5): the skew kernel emits M with
        # R = M + M^T and the tracking solver applies M x + M^T x via
        # transposed dot_generals, so the (4, SJ, SJ) symmetric-
        # completion transpose+select pass (~215 MB HBM/hop at SJ=1600)
        # leaves the steady-state hop. Gated at 32 spk vs exact eigh
        # (tools/tracking_gate.py): c1 -0.050 / cV -0.092 dB; sustained
        # 128-hop A/B (tools/halfform_ab.py): 2.196 -> 2.120 ms/hop.
        # Falls back to the completed form with the skew->dense
        # fallback on geometries the kernel can't serve.
        statistics_half_form=on_tpu,
        use_pallas_statistics=on_tpu,  # fallback when skew can't lower
        use_pallas_output=on_tpu,
        use_pallas_conv=on_tpu,
        use_matmul_dft=on_tpu,
        small_eigh="jacobi" if on_tpu else "lapack",
        # 2 sweeps hold the 0.25 dB gate with the warm-started
        # near-diagonal Rayleigh-Ritz matrix (tools/solver_knobs.py:
        # delta1 0.0011 / deltaV 0.0725, ~165 us/hop cheaper than 3).
        jacobi_sweeps=2,
        # use_pallas_whiten stays False: two generations of the kernel
        # lost to the XLA custom-call chain in-engine on the north-star
        # scene (tools/whiten_gate.py). Fully fused fori_loop kernel:
        # 1.78 vs 1.55 ms/hop (sequential masked rank-1 reductions).
        # Hybrid unrolled-32-blocked Pallas panels + XLA trailing
        # updates: 1.914 vs 1.341 ms/hop (per-panel dispatch chain +
        # 128-padded concat assembly outweigh the removed factor-call
        # latency; XLA's batched chain overlaps across the two
        # pencils). Kept for runtimes with higher per-dispatch
        # overhead.
    )
