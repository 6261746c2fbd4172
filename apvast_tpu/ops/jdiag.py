"""Joint diagonalization of a symmetric-PSD matrix pencil (A, B).

TPU-native replacement for the reference ``jdiag``
(Python/apvast.py:20-36, Matlab/ControlMethods/jdiag.m:90-125): the
reference whitens with a Cholesky factor of B and then runs a real Schur
decomposition. Because the whitened matrix is symmetric, its Schur form
*is* its eigendecomposition, so the TPU kernel uses
``jnp.linalg.eigh`` — batched, differentiable and XLA-compiled — instead
of the LAPACK Hessenberg/QR path which does not exist on TPU.

Contract (Matlab/ControlMethods/jdiag.m:33-39):
    U^T A U = diag(d)   with d sorted descending,
    U^T B U = I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def jdiag(A: jax.Array, B: jax.Array, reg: float | jax.Array = 1e-7):
    """Jointly diagonalize one symmetric-PSD pencil.

    ``reg`` is the diagonal loading applied to B before the Cholesky
    factorization (the reference's EXPERIMENTAL_REGULARIZATION path,
    Python/apvast.py:22-24). Pass ``reg=0`` if loading was already applied
    by the caller (the MATLAB convention, apVast.m:552-569).

    Returns ``(U, d)`` where ``U`` has generalized eigenvectors in its
    columns and ``d`` holds eigenvalues in descending order.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    chol = jnp.linalg.cholesky(B + reg * eye)
    # Whiten: C = L^{-1} A L^{-T} (two triangular solves, as in
    # Python/apvast.py:28-29).
    half = solve_triangular(chol, A, lower=True)
    white = solve_triangular(chol, half.T, lower=True).T
    # The whitened matrix is symmetric up to roundoff; symmetrize so eigh
    # sees an exactly-symmetric operand.
    white = 0.5 * (white + white.T)
    d, v = jnp.linalg.eigh(white)  # ascending
    # Descending order (Python/apvast.py:32-35 flips an argsort): flip
    # the eigenvector columns BEFORE the back-transform — bit-identical
    # per column, and the (n, n) lane reversal happens on v where XLA
    # folds it into the eigh epilogue instead of on the solve output.
    u = solve_triangular(chol.T, v[:, ::-1], lower=False)
    return u, d[::-1]


# Batched over a leading pencil axis: used to solve both zones (and any
# number of frames / subbands / hyperparameter grid points) in one XLA call.
jdiag_batched = jax.vmap(jdiag, in_axes=(0, 0, None))


def _cholqr2(q: jax.Array) -> jax.Array:
    """CholeskyQR2 orthonormalization — matmul + small Cholesky only, so
    the whole subspace iteration stays on the MXU (no Householder panels).
    Two passes give QR-level orthogonality for moderately conditioned
    blocks, which per-iteration re-orthogonalization guarantees here.

    The Gram matrix is jittered relative to its own trace: rank-deficient
    blocks (e.g. the warmup hops of a heavily perceptually-weighted
    scene) would otherwise make the Cholesky produce NaNs that poison the
    warm-started subspace permanently."""
    from apvast_tpu.ops.trisolve import neumann_tri_inverse

    k = q.shape[-1]
    eye = jnp.eye(k, dtype=q.dtype)
    hi = jax.lax.Precision.HIGH
    for _ in range(2):
        gram = jnp.matmul(q.T, q, precision=hi)
        jitter = (jnp.trace(gram) / k) * 1e-6 + jnp.asarray(
            1e-30, dtype=q.dtype
        )
        chol = jnp.linalg.cholesky(gram + jitter * eye)
        # q <- q L^-T via the matmul-only small inverse (the triangular
        # solve is a latency-bound custom call at this size).
        q = jnp.matmul(q, neumann_tri_inverse(chol).T, precision=hi)
    return q


def _topk_project(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array,
    iters: int,
    q_init: jax.Array,
    orth: str,
    whiten: str,
    li_pre: jax.Array | None = None,
):
    """Subspace-iteration front half of :func:`jdiag_topk`: whitening
    setup, the iteration itself, and the small Rayleigh-Ritz projection.
    Returns ``(small, q, wmat)`` where ``wmat`` is the whitening matrix
    needed by the back-transform (``L^{-1}`` for the 'invert' path, the
    Cholesky factor for 'solve'). ``li_pre`` short-circuits the 'invert'
    whitening setup with a precomputed inverse Cholesky factor (the
    fused Pallas kernel, ops/pallas/whiten.py)."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)

    if whiten == "invert" and li_pre is not None:
        li = li_pre
        hi = jax.lax.Precision.HIGH

        def apply_white(x):
            y = jnp.matmul(li.T, x, precision=hi)
            y = jnp.matmul(A, y, precision=hi)
            return jnp.matmul(li, y, precision=hi)

        wmat = li
    elif whiten == "invert":
        # Matmul-only path: invert L once by blocked recursion
        # (ops/trisolve.py) — every whitened-operator application and the
        # back-transform are MXU matmuls, no latency-bound full-matrix
        # substitutions on the hot path. The Cholesky itself stays on
        # XLA's custom call: a blocked re-implementation with
        # Neumann-inverted panel solves turned marginal float32 scenes
        # (covariance cond ~1e6+, reg_b_relative=1e-6) from barely-
        # factorizable into NaN.
        from apvast_tpu.ops.trisolve import triangular_inverse

        chol = jnp.linalg.cholesky(B + reg * eye)
        li = triangular_inverse(chol)

        hi = jax.lax.Precision.HIGH

        def apply_white(x):
            # Raised precision matters: the default single-pass
            # bf16-internal MXU matmuls cost ~0.3 dB of rank-V contrast
            # on TPU. HIGH (3-pass bf16 emulation, ~f32 accuracy) is
            # enough and half the cost of HIGHEST on these tiny
            # k-column matmuls.
            y = jnp.matmul(li.T, x, precision=hi)
            y = jnp.matmul(A, y, precision=hi)
            return jnp.matmul(li, y, precision=hi)

        wmat = li
    else:
        # The whitened operator C = L^{-1} A L^{-T} applied IMPLICITLY:
        # triangular solves against the k-column subspace only.
        chol = jnp.linalg.cholesky(B + reg * eye)

        def apply_white(x):
            y = solve_triangular(chol.T, x, lower=False)  # L^{-T} x
            y = A @ y
            return solve_triangular(chol, y, lower=True)

        wmat = chol

    orthonormalize = _cholqr2 if orth == "cholqr2" else (
        lambda q: jnp.linalg.qr(q)[0]
    )

    def body(q, _):
        return orthonormalize(apply_white(q)), None

    q, _ = jax.lax.scan(body, q_init, None, length=iters)
    small = jnp.matmul(
        q.T, apply_white(q), precision=jax.lax.Precision.HIGHEST
    )
    return 0.5 * (small + small.T), q, wmat


def _topk_extract(small_d, small_v, q, wmat, num_vectors, q_init, whiten):
    """Ritz extraction + back-transform back half of :func:`jdiag_topk`.
    ``small_d``/``small_v`` are the ASCENDING eigendecomposition of the
    projected matrix. Returns ``(u, d, ritz, silenced)`` where
    ``silenced`` counts the non-finite entries that the guards zeroed —
    zero on a healthy hop; a persistently positive count is a
    conditioning regression (VERDICT round-1 weak #4)."""
    d = small_d[::-1][:num_vectors]
    # Flip the SMALL (k, k) eigenvector matrix to descending order before
    # the big matmul: flipping (q @ V) afterwards is a lane reversal of
    # the (n, k) product — measured 171 us/hop of pure relayout copies on
    # the north-star trace.
    ritz = q @ small_v[:, ::-1]
    if whiten == "invert":
        u = jnp.matmul(
            wmat.T, ritz[:, :num_vectors],
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        u = solve_triangular(wmat.T, ritz[:, :num_vectors], lower=False)
    # Transient non-finites (degenerate warmup statistics in float32) must
    # neither poison the warm-start carry nor reach the synthesized
    # filters: fall back to the incoming subspace, and zero bad
    # eigenvectors (=> silent output for that hop, matching the FD
    # engine's guard).
    bad_u = ~jnp.isfinite(u)
    bad_d = ~jnp.isfinite(d)
    silenced = jnp.sum(bad_u, dtype=jnp.int32) + jnp.sum(
        bad_d, dtype=jnp.int32
    )
    ritz = jnp.where(jnp.isfinite(ritz), ritz, q_init)
    u = jnp.where(bad_u, 0, u)
    d = jnp.where(bad_d, 0, d)
    return u, d, ritz, silenced


def jdiag_topk(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array,
    num_vectors: int,
    iters: int,
    q_init: jax.Array,
    orth: str = "qr",
    whiten: str = "solve",
):
    """Top-k generalized eigenpairs by blocked subspace iteration.

    The engine's filter synthesis consumes only the leading
    ``num_eigenvectors`` eigenpairs (Python/apvast.py:406-414), so the
    full O(n^3)-with-large-constant dense eigendecomposition can be
    replaced by an MXU-native iteration: repeated multiplication of a
    (n, k) block by the whitened operator with QR re-orthogonalization,
    then a Rayleigh-Ritz eigensolve of the small (k, k) projection.
    Validated on the bundled scene to reproduce the exact solver's
    acoustic contrast to < 0.01 dB at every span rank (k = V + 78,
    iters = 16, float32).

    Args:
        q_init: (n, k) initial subspace — pass the previous hop's
            returned subspace to warm-start (cuts iterations), or any
            full-rank block (e.g. a fixed random matrix) cold.

    Returns:
        (u, d, q): top-k generalized eigenvectors (n, k) and eigenvalues
        (k,), both descending, plus the orthonormal subspace to carry.
    """
    small, q, wmat = _topk_project(A, B, reg, iters, q_init, orth, whiten)
    d, v = jnp.linalg.eigh(small)  # ascending
    u, dd, ritz, _ = _topk_extract(d, v, q, wmat, num_vectors, q_init, whiten)
    return u, dd, ritz


def jdiag_topk_batched(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array,
    num_vectors: int,
    iters: int,
    q_init: jax.Array,
    orth: str = "qr",
    whiten: str = "solve",
    small_eigh: str = "lapack",
    jacobi_sweeps: int = 4,
    interpret: bool = False,
    fused_iteration: bool = False,
    whiten_kernel: bool = False,
):
    """Batched :func:`jdiag_topk` over a leading pencil axis.

    ``small_eigh`` selects the Rayleigh-Ritz eigensolver: "lapack" is
    XLA's eigh custom call (exact-parity path); "jacobi" runs the whole
    batch of small projections through ONE fused Pallas cyclic-Jacobi
    kernel (ops/pallas/jacobi_eigh) — the eigh custom call is
    latency-bound at this size and dominates the production solver.

    ``fused_iteration`` runs the whitened power steps + CholeskyQR2 +
    Rayleigh-Ritz projection as ONE Pallas kernel
    (ops/pallas/subspace) — requires whiten='invert', orth='cholqr2'
    and a subspace width that is a multiple of 8.

    Returns ``(u, d, q, silenced)``; ``silenced`` is the total count of
    non-finite solver outputs zeroed by the guards (0 = healthy).

    ``whiten_kernel`` computes the 'invert' whitening setup (Cholesky +
    triangular inversion of the loaded dark matrices) as ONE fused
    Pallas kernel (ops/pallas/whiten.py) instead of XLA's panelized
    custom-call chain — float32 only, n <= 1024 after 128-padding.
    """
    li_pre = None
    if whiten_kernel and whiten == "invert":
        # Hybrid whitening setup: Pallas panel factorizations (replacing
        # XLA's ~28 us/panel factor custom calls) + XLA trailing updates
        # + the batched-level triangular inversion. The FULLY fused
        # kernel (chol_tri_inverse_pallas) measured 1188 us vs the XLA
        # chain's 660 us standalone — its misaligned sub-tile traffic
        # cost more than the dispatches it removed. The hybrid also
        # loses IN-ENGINE on the north-star scene (1.914 vs
        # 1.341 ms/hop, tools/whiten_gate.py 2026-08-18): the 7
        # sequential per-panel pallas_calls + the 896-padded concat
        # assembly of the factor outweigh the panel-factor dispatch
        # latency they remove, while XLA's batched custom-call chain
        # overlaps across the two pencils. Production keeps
        # use_pallas_whiten=False; this path remains for runtimes with
        # higher per-dispatch cost.
        from apvast_tpu.ops.pallas.whiten import blocked_cholesky
        from apvast_tpu.ops.trisolve import triangular_inverse

        n = A.shape[-1]
        eye = jnp.eye(n, dtype=A.dtype)
        chol = blocked_cholesky(B + reg * eye, interpret=interpret)
        li_pre = triangular_inverse(chol)
    if fused_iteration:
        if whiten != "invert" or orth != "cholqr2":
            raise ValueError(
                "fused_iteration requires whiten='invert', orth='cholqr2'"
            )
        from apvast_tpu.ops.pallas.subspace import subspace_iterate_pallas
        from apvast_tpu.ops.trisolve import triangular_inverse

        if li_pre is not None:
            wmat = li_pre
        else:
            n = A.shape[-1]
            eye = jnp.eye(n, dtype=A.dtype)
            chol = jnp.linalg.cholesky(B + reg * eye)
            wmat = triangular_inverse(chol)
        q, small = subspace_iterate_pallas(
            A, wmat, q_init, iters, interpret=interpret
        )
    else:
        small, q, wmat = jax.vmap(
            _topk_project,
            in_axes=(
                0, 0, None, None, 0, None, None,
                0 if li_pre is not None else None,
            ),
        )(A, B, reg, iters, q_init, orth, whiten, li_pre)
    if small_eigh == "jacobi":
        from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

        d, v = jacobi_eigh(small, sweeps=jacobi_sweeps, interpret=interpret)
    else:
        d, v = jnp.linalg.eigh(small)  # ascending
    u, dd, ritz, silenced = jax.vmap(
        _topk_extract, in_axes=(0, 0, 0, 0, None, 0, None)
    )(d, v, q, wmat, num_vectors, q_init, whiten)
    return u, dd, ritz, jnp.sum(silenced, dtype=jnp.int32)


def jdiag_topk_pencil_batched(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array,
    num_vectors: int,
    iters: int,
    q_init: jax.Array,
    m_init: jax.Array,
    orth: str = "cholqr2",
    small_eigh: str = "lapack",
    jacobi_sweeps: int = 4,
    newton_steps: int = 1,
    resid_max: float = 0.7,
    interpret: bool = False,
):
    """Top-k GEVD without a per-hop full Cholesky: carried Newton inverse.

    The 'invert' whitening path re-factorizes the (n, n) dark matrix every
    hop (XLA's blocked Cholesky custom call: ~290 us/hop of latency-bound
    128-panel calls on the north-star trace — the single largest solver
    op). This variant instead CARRIES an approximate inverse M ~= B^-1
    across hops and keeps it current with one Newton-Schulz step
    M <- M (2I - B M) per hop — two (n, n, n) MXU matmuls with quadratic
    self-correction, no factorization. The subspace iterates on the
    operator M A (inexactness is absorbed by the Rayleigh-Ritz step), and
    the small (k, k) eigenproblem is solved as a projected PENCIL
    (Q^T A Q, Q^T B Q) — exact A/B enter at HIGHEST precision, so M's
    residual error never touches the extracted eigenpairs beyond the
    subspace angle.

    Self-healing: when the scaled residual ||I - B M||_F exceeds
    ``resid_max`` (cold start, signal onsets, NaN-poisoned M), ONE shared
    lax.cond branch rebuilds M from a fresh Cholesky + blocked triangular
    inversion — the old per-hop cost, paid only on those hops.

    Contract matches :func:`jdiag_topk_batched`: returns
    ``(u, d, q_next, m_next, silenced)`` with ``U^T (B + reg I) U = I``
    and d descending. ``q_init``/``m_init`` are the carried subspace
    (z, n, k) and approximate inverse (z, n, n); initialize M with
    identity (the first hop takes the rebuild branch by design).
    """
    from apvast_tpu.ops.trisolve import (
        neumann_tri_inverse,
        triangular_inverse,
    )

    z, n, _ = A.shape
    dtype = A.dtype
    eye = jnp.eye(n, dtype=dtype)
    b_l = B + reg * eye
    hi = jax.lax.Precision.HIGH
    hst = jax.lax.Precision.HIGHEST

    # ---- carried-inverse refresh or rebuild (one cond for the batch:
    # under vmap a cond becomes a select that executes BOTH branches,
    # so the decision is shared and the branches operate batched) ------
    resid = eye - jnp.matmul(b_l, m_init, precision=hi)
    rn = jnp.sqrt(jnp.sum(jnp.square(resid), axis=(-2, -1)))  # (z,) Frob
    worst = jnp.max(rn)
    healthy = jnp.isfinite(worst) & (worst < resid_max)

    def _newton(_):
        m = m_init + jnp.matmul(m_init, resid, precision=hi)
        for _ in range(newton_steps - 1):
            r = eye - jnp.matmul(b_l, m, precision=hi)
            m = m + jnp.matmul(m, r, precision=hi)
        return m

    def _rebuild(_):
        chol = jnp.linalg.cholesky(b_l)
        li = triangular_inverse(chol)
        return jnp.matmul(li.swapaxes(-1, -2), li, precision=hi)

    m = jax.lax.cond(healthy, _newton, _rebuild, None)
    m = 0.5 * (m + m.swapaxes(-1, -2))

    # ---- subspace iteration on M A -----------------------------------
    orthon = _cholqr2 if orth == "cholqr2" else (lambda x: jnp.linalg.qr(x)[0])
    q = q_init
    for _ in range(iters):
        aq = jnp.matmul(A, q, precision=hi)
        q = jax.vmap(orthon)(jnp.matmul(m, aq, precision=hi))

    # ---- pencil Rayleigh-Ritz (exact A, B at HIGHEST) ----------------
    k = q.shape[-1]
    qt = q.swapaxes(-1, -2)
    abar = jnp.matmul(qt, jnp.matmul(A, q, precision=hst), precision=hst)
    bbar = jnp.matmul(qt, jnp.matmul(b_l, q, precision=hst), precision=hst)
    abar = 0.5 * (abar + abar.swapaxes(-1, -2))
    bbar = 0.5 * (bbar + bbar.swapaxes(-1, -2))
    eyek = jnp.eye(k, dtype=dtype)
    # Trace-relative, DTYPE-SCALED jitter: Q is orthonormalized and B
    # loaded, so bbar is PD in exact arithmetic; the jitter only covers
    # roundoff on warmup hops. A fixed 1e-7 would bias float64
    # eigenvalues at the 1e-6 relative level (measured).
    tr = jnp.einsum("zii->z", bbar) / k
    jit_rel = 8.0 * float(jnp.finfo(dtype).eps)
    lb = jnp.linalg.cholesky(bbar + (jit_rel * tr)[:, None, None] * eyek)
    lib = neumann_tri_inverse(lb)
    white = jnp.matmul(
        jnp.matmul(lib, abar, precision=hst),
        lib.swapaxes(-1, -2),
        precision=hst,
    )
    white = 0.5 * (white + white.swapaxes(-1, -2))
    if small_eigh == "jacobi":
        from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

        d, v = jacobi_eigh(white, sweeps=jacobi_sweeps, interpret=interpret)
    else:
        d, v = jnp.linalg.eigh(white)  # ascending
    ubar = jnp.matmul(lib.swapaxes(-1, -2), v, precision=hst)
    d_desc = d[..., ::-1][..., :num_vectors]
    u = jnp.matmul(q, ubar[..., ::-1][..., :num_vectors], precision=hst)
    # Carry: Ritz-rotated subspace (descending), euclidean-orthonormal
    # because v is orthonormal and q is.
    ritz = jnp.matmul(q, v[..., ::-1], precision=hst)

    bad_u = ~jnp.isfinite(u)
    bad_d = ~jnp.isfinite(d_desc)
    silenced = jnp.sum(bad_u, dtype=jnp.int32) + jnp.sum(
        bad_d, dtype=jnp.int32
    )
    ritz = jnp.where(jnp.isfinite(ritz), ritz, q_init)
    # Zone-wise degeneracy guard (same failure mode as the tracked
    # solver, see jdiag_topk_tracked): a silence-collapsed pencil can
    # underflow the carried warm-start to exactly zero THROUGH the
    # isfinite guard (cholqr2 of a ~zero block is finite zero); a zero
    # warm start is absorbing. Restart such zones from q_init's
    # sanitized value or identity columns.
    fin_r = jnp.isfinite(ritz).all(axis=(-2, -1))
    cn_r = jnp.min(jnp.sum(ritz * ritz, axis=-2), axis=-1)
    ok_r = fin_r & (cn_r > jnp.asarray(1e-20, cn_r.dtype))
    eye_nk_ = jnp.broadcast_to(
        jnp.eye(ritz.shape[1], dtype=ritz.dtype)[:, : ritz.shape[-1]],
        ritz.shape,
    )
    fin_q0 = jnp.isfinite(q_init).all(axis=(-2, -1))
    cn_q0 = jnp.min(jnp.sum(q_init * q_init, axis=-2), axis=-1)
    ok_q0 = fin_q0 & (cn_q0 > jnp.asarray(1e-20, cn_q0.dtype))
    fb = jnp.where(ok_q0[:, None, None], q_init, eye_nk_)
    ritz = jnp.where(ok_r[:, None, None], ritz, fb)
    u = jnp.where(bad_u, 0, u)
    d_desc = jnp.where(bad_d, 0, d_desc)
    # A NaN M self-heals: next hop's residual is NaN -> not healthy ->
    # rebuild branch. No guard needed on the carry itself.
    return u, d_desc, ritz, m, silenced


def jdiag_topk_tracked(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array,
    num_vectors: int,
    q_init: jax.Array,
    lam_init: jax.Array,
    li_carry: jax.Array,
    rebuild: jax.Array,
    outer_steps: int = 2,
    small_eigh: str = "lapack",
    jacobi_sweeps: int = 4,
    interpret: bool = False,
    residual_precision: str = "high",
    rr_basis: str = "cholqr2",
    half_form: bool = False,
):
    """Top-k GEVD by inner-outer subspace TRACKING — no per-hop (n, n)
    factorization.

    ``half_form``: ``A``/``B`` are given as half matrices M with the
    true symmetric pencil R = M + M^T (the skew statistics kernel's
    ``form='half'`` output). Every application R x becomes two MXU
    contractions M x + M^T x (``dot_general`` with transposed
    contraction dims — no materialized transpose), and the full dark
    matrix is materialized only inside the rebuild branch for its
    Cholesky. This removes the statistics path's symmetric-completion
    pass (~215 MB/hop HBM at SJ=1600) from the steady-state hop.

    The production 'invert' whitening re-factorizes the loaded dark
    matrix every hop: XLA's blocked Cholesky (~840 us at n = 1600,
    tools/solver_lab.py) + the blocked triangular inversion and their
    mask/relayout HBM traffic — the largest block of device time in the
    32-speaker hop. This solver instead:

      1. CARRIES the inverse Cholesky factor Li across hops and
         refreshes it only when ``rebuild`` is set (every T hops plus a
         short warmup window — engine/hop.py) — staleness makes it a
         PRECONDITIONER, never a correctness input;
      2. each outer step expands the carried Ritz basis X (n, k) with
         the preconditioned block residual M r = Li^T Li (A X - B X L)
         (LOBPCG-style: Rayleigh-Ritz on the EXACT pencil converges to
         the true generalized eigenspace for any full-rank M — unlike
         the rejected stale-operator power iteration, see the
         subspace_whiten='newton' note in config.py);
      3. solves the doubled (2k) Rayleigh-Ritz pencil INEXACTLY with the
         same warm-started trick one level down: whiten the (2k, 2k)
         pencil by its own small Cholesky (trivial FLOPs), two power
         steps of a k-block seeded from the X coordinates, then one
         k-wide eigensolve — the only non-matmul op per step is the
         existing k x k Jacobi/eigh (XLA's exact 128-wide eigh measures
         ~900 us; this path keeps the 64-wide ~120 us budget).

    Offline validation on captured 32-speaker pencils
    (tools/tracking_lab.py): 2 outer steps + rebuild every 4 hops +
    4-hop warmup tracks the exact solver's span-filter contrast to
    production-solver accuracy from hop 0 (PERF.md round-4 table).

    Args:
        q_init: (z, n, k) carried Ritz vectors (B-orthonormal columns,
            descending; any full-rank block cold).
        lam_init: (z, k) carried Ritz values (zeros cold).
        li_carry: (z, n, n) carried inverse Cholesky factor (identity
            cold — ``rebuild`` must be True on the first hop).
        rebuild: bool scalar — refresh Li from a fresh factorization.

    Returns ``(u, d, q_next, lam_next, li_next, silenced, resid_rel)``
    with ``U^T (B + reg I) U = I`` and d descending, matching
    :func:`jdiag_topk_batched`'s extraction contract; ``resid_rel`` is
    the scalar relative block-residual of the INCOMING Ritz pairs on
    this hop's pencil (max over zones) — carry it and feed the
    residual-triggered rebuild predicate.
    """
    from apvast_tpu.ops.trisolve import triangular_inverse

    z, n, _ = A.shape
    k = q_init.shape[-1]
    dtype = A.dtype
    eye = jnp.eye(n, dtype=dtype)
    hi = jax.lax.Precision.HIGH
    hst = jax.lax.Precision.HIGHEST

    # ---- basis-health guard (round-5 horizon-gate fix) ----------------
    # A sustained TRUE-silence gap collapses the pencil: the Ritz values
    # decay geometrically and the inner cholqr2 of a ~zero RR matrix
    # returns an EXACTLY-ZERO (finite) factor, so zero propagates into
    # the carried basis THROUGH every non-finite guard (0 x finite = 0,
    # no NaNs anywhere). A zero basis is then absorbing: zero RR pencil
    # -> zero basis out, and its block residual is 0/tiny = 0 — BELOW
    # any rebuild threshold, so the residual fallback is blind too.
    # Measured (tools/silence_probe.py, 32 spk): carried q underflows to
    # all-zero on the 7th silent hop and the engine stays silent for the
    # rest of the stream while exact eigh recovers immediately.
    # Guard ZONE-WISE: a basis is healthy iff all-finite AND no column
    # has (near-)underflowed. Unhealthy zones restart from identity
    # columns — full-rank, and the exact-pencil Rayleigh-Ritz plus the
    # forced rebuild reconverge it within an outer step or two once
    # statistics return.
    eye_nk = jnp.broadcast_to(eye[:, :k], (z, n, k))

    def _basis_healthy(qz):
        fin = jnp.isfinite(qz).all(axis=(-2, -1))
        cn = jnp.min(jnp.sum(qz * qz, axis=-2), axis=-1)
        return fin & (cn > jnp.asarray(1e-20, cn.dtype))

    healthy0 = _basis_healthy(q_init)
    q_init = jnp.where(healthy0[:, None, None], q_init, eye_nk)
    lam_init = jnp.where(healthy0[:, None], lam_init, 0.0)

    if half_form:
        def _tmm(m, x, prec):
            # (z, n, n)^T @ (z, n, k) without materializing the transpose.
            return jax.lax.dot_general(
                m, x,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=prec,
            )

        def apply_a(x, prec):
            return jnp.matmul(A, x, precision=prec) + _tmm(A, x, prec)

        def apply_b(x, prec):
            return (
                jnp.matmul(B, x, precision=prec)
                + _tmm(B, x, prec)
                + reg * x
            )

        def b_full():
            return B + B.swapaxes(-1, -2) + reg * eye
    else:
        b_l = B + reg * eye

        def apply_a(x, prec):
            return jnp.matmul(A, x, precision=prec)

        def apply_b(x, prec):
            return jnp.matmul(b_l, x, precision=prec)

        def b_full():
            return b_l

    def _rebuild_li(_):
        # The carry may be bfloat16 (config.tracking_li_bf16): Li is a
        # preconditioner only, and the half-width carry halves the
        # (z, n, n) scan-copy/select HBM traffic. Under half_form the
        # full dark matrix exists only here, inside the rebuild branch.
        fresh = triangular_inverse(jnp.linalg.cholesky(b_full())).astype(
            li_carry.dtype
        )
        # Self-heal INSIDE the branch: a non-finite fresh factor falls
        # back to the carried one. Healing outside the cond would pay an
        # isfinite + select over the (z, n, n) carry EVERY hop (~250 us
        # of pure HBM traffic at JL=1600) for a value that is untouched
        # on non-rebuild hops.
        return jnp.where(jnp.isfinite(fresh), fresh, li_carry)

    li = jax.lax.cond(rebuild, _rebuild_li, lambda _: li_carry, None)

    def small_solve(h):
        """Eigendecomposition of the (z, k, k) symmetric RR matrix."""
        if small_eigh == "jacobi":
            from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

            return jacobi_eigh(h, sweeps=jacobi_sweeps, interpret=interpret)
        return jnp.linalg.eigh(h)

    # The residual path (aq/bq/p) only STEERS the preconditioned basis
    # expansion — the Rayleigh-Ritz matrices below are recomputed on the
    # exact pencil at full precision — so it tolerates single-pass bf16
    # matmuls (residual_precision="default"), saving 2/3 of the 3-pass
    # HIGH cost on the four (n, n) x (n, k) products.
    rp = jax.lax.Precision.HIGH if residual_precision == "high" else (
        jax.lax.Precision.DEFAULT
    )
    q, lam = q_init, lam_init
    resid_rel = None
    for _ in range(outer_steps):
        aq = apply_a(q, rp)
        bq = apply_b(q, rp)
        res = aq - bq * lam[:, None, :]
        if resid_rel is None:
            # Staleness scalar for the residual-triggered rebuild
            # (VERDICT r4 #4): the relative block-residual norm of the
            # INCOMING Ritz pairs on the current pencil, from matrices
            # already computed — free beyond two reductions. Returned to
            # the caller, which carries it and ORs next hop's rebuild
            # predicate when it exceeds the configured threshold. A
            # non-finite residual maps to +inf (forces a rebuild — the
            # same self-heal direction as the carry guards below).
            num = jnp.sum(
                jnp.square(res.astype(jnp.float32)), axis=(-2, -1)
            )
            den = jnp.sum(
                jnp.square(aq.astype(jnp.float32)), axis=(-2, -1)
            )
            resid_rel = jnp.max(
                jnp.sqrt(num / (den + jnp.finfo(jnp.float32).tiny))
            )
            resid_rel = jnp.where(
                jnp.isfinite(resid_rel), resid_rel, jnp.inf
            )
        p = jnp.matmul(
            li.swapaxes(-1, -2), jnp.matmul(li, res, precision=rp),
            precision=rp,
        )
        if rr_basis == "direct":
            # Rayleigh-Ritz on the RAW doubled basis [q, p]: the
            # generalized RR solve below Cholesky-whitens bbar, so the
            # basis need not be orthonormalized — and reusing aq/bq as
            # the first k columns of A s / B s saves the CholeskyQR2
            # pass AND turns the two (n, n) x (n, 2k) products into
            # (n, n) x (n, k) ones (1/3 of the big-matmul budget).
            # Column-scale p so bbar stays balanced.
            pn = jnp.sqrt(jnp.sum(p * p, axis=-2, keepdims=True))
            p = p / (pn + jnp.asarray(jnp.finfo(dtype).tiny, dtype))
            ap = apply_a(p, hi)
            bp = apply_b(p, hi)
            s = jnp.concatenate([q, p], axis=-1)
            a_s = jnp.concatenate([aq, ap], axis=-1)
            b_s = jnp.concatenate([bq, bp], axis=-1)
        else:
            s = jax.vmap(_cholqr2)(jnp.concatenate([q, p], axis=-1))
            # Exact-pencil Rayleigh-Ritz matrices on the doubled basis.
            a_s = apply_a(s, hi)
            b_s = apply_b(s, hi)
        st = s.swapaxes(-1, -2)
        abar = jnp.matmul(st, a_s, precision=hst)
        bbar = jnp.matmul(st, b_s, precision=hst)
        abar = 0.5 * (abar + abar.swapaxes(-1, -2))
        bbar = 0.5 * (bbar + bbar.swapaxes(-1, -2))
        kk = bbar.shape[-1]
        eyek = jnp.eye(kk, dtype=dtype)
        tr = jnp.einsum("zii->z", bbar) / kk
        # Trace-relative, DTYPE-SCALED jitter (same rationale as
        # jdiag_topk_pencil_batched): a fixed 1e-6 would bias float64
        # eigenvalues at the ~1e-4 relative level (measured in
        # tests/test_tracking_solver.py).
        jit_rel = 8.0 * float(jnp.finfo(dtype).eps)
        bbar = bbar + (jit_rel * tr)[:, None, None] * eyek
        lbar = jnp.linalg.cholesky(bbar)  # (z, 2k, 2k) — trivial FLOPs
        libar = triangular_inverse(lbar)
        wbar = jnp.matmul(
            jnp.matmul(libar, abar, precision=hst),
            libar.swapaxes(-1, -2),
            precision=hst,
        )
        wbar = 0.5 * (wbar + wbar.swapaxes(-1, -2))
        # Inner inexact solve: k-block power steps seeded from the X
        # coordinates (the previous Ritz vectors span basis slots :k).
        y = jax.vmap(_cholqr2)(lbar.swapaxes(-1, -2)[:, :, :k])
        for _pi in range(2):
            y = jax.vmap(_cholqr2)(jnp.matmul(wbar, y, precision=hst))
        h = jnp.matmul(
            y.swapaxes(-1, -2), jnp.matmul(wbar, y, precision=hst),
            precision=hst,
        )
        h = 0.5 * (h + h.swapaxes(-1, -2))
        d, v = small_solve(h)  # ascending
        c = jnp.matmul(
            libar.swapaxes(-1, -2),
            jnp.matmul(y, v[..., ::-1], precision=hst),
            precision=hst,
        )  # (z, 2k, k) pencil coordinates, descending, c^T bbar c = I
        q = jnp.matmul(s, c, precision=hst)  # B-orthonormal Ritz vectors
        lam = d[..., ::-1]

    u = q[..., :num_vectors]
    dd = lam[..., :num_vectors]
    bad_u = ~jnp.isfinite(u)
    bad_d = ~jnp.isfinite(dd)
    silenced = jnp.sum(bad_u, dtype=jnp.int32) + jnp.sum(
        bad_d, dtype=jnp.int32
    )
    u = jnp.where(bad_u, 0, u)
    dd = jnp.where(bad_d, 0, dd)
    # Carries self-heal: non-finite entries fall back to the incoming
    # values, and a zone whose outgoing basis went DEGENERATE (zero /
    # underflowed columns — finite, so the isfinite guard alone cannot
    # see it) falls back to the sanitized entry basis, so one collapsed
    # hop cannot poison the tracker permanently. (The Li carry is
    # healed inside the rebuild branch above — on every other hop it is
    # passed through untouched.)
    q = jnp.where(jnp.isfinite(q), q, q_init)
    lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
    healthy1 = _basis_healthy(q)
    q = jnp.where(healthy1[:, None, None], q, q_init)
    lam = jnp.where(healthy1[:, None], lam, lam_init)
    # A degenerate hop (either direction) must also force the caller's
    # rebuild path: the zero-basis block residual reads 0, so report
    # +inf instead of a value below every threshold.
    resid_rel = jnp.where(
        jnp.all(healthy0) & jnp.all(healthy1), resid_rel, jnp.inf
    )
    return u, dd, q, lam, li, silenced, resid_rel


def jdiag_hermitian(A: jax.Array, B: jax.Array, reg: float | jax.Array = 1e-7):
    """Joint diagonalization of a complex Hermitian-PSD pencil.

    The frequency-domain engine's per-bin analog of :func:`jdiag`: the
    S x S spatial covariance pencils of each STFT bin are complex
    Hermitian, so whitening uses conjugate transposes. Contract:
    ``U^H A U = diag(d)`` (d real, descending), ``U^H B_reg U = I``.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    chol = jnp.linalg.cholesky(B + reg * eye)
    half = solve_triangular(chol, A, lower=True)
    white = solve_triangular(chol, half.conj().T, lower=True).conj().T
    white = 0.5 * (white + white.conj().T)
    d, v = jnp.linalg.eigh(white)  # ascending, d real
    u = solve_triangular(chol.conj().T, v, lower=False)
    return u[:, ::-1], d[::-1]


def jdiag_hermitian_batched(
    A: jax.Array,
    B: jax.Array,
    reg: float | jax.Array = 1e-7,
    eigh_impl: str = "lapack",
    jacobi_sweeps: int = 8,
    interpret: bool = False,
):
    """Batched :func:`jdiag_hermitian` over a leading pencil axis — the
    FD engine's workhorse (zones x bins pencils).

    ``eigh_impl`` selects the Hermitian eigensolver for the whitened
    matrices: "lapack" is XLA's complex eigh custom call — measured
    ~2.7 ms/hop at (1602, 8, 8) on the FD trace, almost the entire FD
    hop budget — and "jacobi" routes the WHOLE batch through one real
    Pallas cyclic-Jacobi kernel via the symmetric embedding
    (ops/pallas/jacobi_eigh.jacobi_eigh_hermitian).
    """
    if eigh_impl == "lapack":
        return jax.vmap(jdiag_hermitian, in_axes=(0, 0, None))(A, B, reg)

    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)

    # Unrolled tiny-batch Cholesky (ops/small_chol): the LAPACK-shaped
    # batched cholesky custom call costs 1.39 ms at (1602, 8, 8) on v5e.
    from apvast_tpu.ops.small_chol import cholesky_small

    chol = cholesky_small(B + reg * eye)

    def _whiten(a, c):
        half = solve_triangular(c, a, lower=True)
        white = solve_triangular(c, half.conj().T, lower=True).conj().T
        return 0.5 * (white + white.conj().T)

    white = jax.vmap(_whiten)(A, chol)
    from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh_hermitian

    d, v = jacobi_eigh_hermitian(
        white, sweeps=jacobi_sweeps, interpret=interpret
    )  # ascending
    u = jax.vmap(
        lambda c, vv: solve_triangular(c.conj().T, vv, lower=False)
    )(chol, v)
    return u[..., ::-1], d[..., ::-1]
