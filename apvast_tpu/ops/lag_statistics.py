"""Lag-domain statistics: the Toeplitz Gram computed from correlations.

The reference forms the spatial-correlation matrices as dense Grams of
Toeplitz data matrices (Python/apvast.py:329-364): ``R = sum_m Y_m Y_m^T``
with ``Y_m`` of shape (S*J, K) whose rows are *shifted copies* of the same
per-source signals, ``y[(s,tap), t] = x_s[t + J-1-tap]``. The dense Gram
costs O(M (SJ)^2 K) — ~78 GFLOP per hop on the 16-speaker north-star scene
and ~640 GFLOP at 32 speakers — but the shift structure means every entry
is a *windowed lag correlation*:

    R[(s1,t1),(s2,t2)] = C_{a,b} = sum_{t=0}^{K-1} x1[t+a] x2[t+b],
    a = J-1-t1, b = J-1-t2,

and along each diagonal C obeys the rank-1 recurrence

    C_{a,b} = C_{a-1,b-1} + x1[a+K-1] x2[b+K-1] - x1[a-1] x2[b-1].

So the whole matrix reduces to (i) one full correlation per source pair at
J lags over the K-sample window (O(M S^2 J K) — ~50x fewer FLOPs than the
Gram at J=50), plus (ii) two J x J cumulative edge tables per pair
(O(M S^2 J^2)), plus a static gather to lay the diagonals out as (SJ, SJ).
The arithmetic is exact — this is a reorganization of the same sums, not
an approximation (float rounding differs only by summation order).

The cross-correlation vector ``r = sum_m Y_m d_m`` is the same correlation
at J lags against the weighted target (O(M S J K)).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _shear_tables(t_tab: jax.Array) -> jax.Array:
    """Lay the diagonal tables out as the lower-triangular (t1 >= t2)
    part of the (J, J) blocks: M[..., t1, t2] = T[..., J-1-t1, t1-t2]
    (garbage above the diagonal, masked by the caller).

    Gather-free: a row-dependent shift is a flatten + reshape with a
    row stride one short of the padded width (TPU gathers lower to
    per-row dynamic-slice loops — measured ~1.2 ms/hop on the
    north-star scene; this is pure copies/reshapes)."""
    j = t_tab.shape[-1]
    a1 = jnp.flip(t_tab, axis=-2)  # A1[..., t1, l] = T[..., J-1-t1, l]
    b1 = jnp.flip(a1, axis=-1)  # B1[..., t1, i] = A1[..., t1, J-1-i]
    # Want M[..., t1, t2] = B1[..., t1, (J-1-t1) + t2]: pad rows to width
    # 2J, flatten, drop the first J-1, reshape with row stride 2J-1.
    p = jnp.pad(b1, [(0, 0)] * (b1.ndim - 1) + [(0, j)])
    flat = p.reshape(*p.shape[:-2], 2 * j * j)
    g = flat[..., j - 1 : j - 1 + j * (2 * j - 1)]
    return g.reshape(*g.shape[:-1], j, 2 * j - 1)[..., :j]


def _c0_conv(x: jax.Array, k: int) -> jax.Array:
    """Windowed correlations via one grouped convolution per path.

    x: (P, M, S, N) -> C0[p, s1, s2, l] = sum_{m, t<k} x[p,m,s1,t] *
    x[p,m,s2,t+l] for l in [0, N-K]. The mic axis is the conv's feature
    contraction; XLA:TPU streams the implicit sliding windows through
    VMEM instead of materializing the (N, S*J) shift matrix in HBM."""

    def per_path(xp):  # (M, S, N)
        lhs = xp.transpose(1, 0, 2)  # (S=batch, M=features, N)
        rhs = xp[:, :, :k].transpose(1, 0, 2)  # (S=out features, M, K)
        out = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
        )  # (s2, s1, l)
        return out.transpose(1, 0, 2)  # (s1, s2, l)

    return jax.vmap(per_path)(x)


def _c0_matmul(x: jax.Array, k: int) -> jax.Array:
    """Same correlations as :func:`_c0_conv` as an explicit matmul against
    shift stacks, scanned over microphones to bound the materialized
    windows to one mic at a time (the full stack would be O(N S J) per
    path-mic — ~200 MB on the north-star scene)."""
    p4, m, s, n = x.shape
    j = n - k + 1

    def body(acc, xm):  # xm: (P, S, N)
        z = jnp.stack(
            [xm[..., l : l + k] for l in range(j)], axis=2
        )  # (P, S2, J, K)
        c = jnp.einsum(
            "pst,pult->psul",
            xm[..., :k],
            z,
            preferred_element_type=x.dtype,
        )
        return acc + c, None

    init = jnp.zeros((p4, s, s, j), dtype=x.dtype)
    acc, _ = jax.lax.scan(body, init, jnp.moveaxis(x, 1, 0))
    return acc


def _c0_fft(x: jax.Array, j: int) -> jax.Array:
    """Same correlations via the half-spectrum DFT identity
    ``sum_{t<K} x1[t] x2[t+l] = (1/N) sum_f a_f Re(conj(U_f) V_f e^{i2pi fl/N})``
    (U = DFT of the K-truncated signal, V = DFT of the full buffer,
    a_f the rfft fold weights) — every stage an MXU matmul against
    trace-time DFT constants, no shift stack at all. With N = buf
    length, lags 0..J-1 never wrap (t + l <= K-1 + J-1 = N-1), so the
    circular correlation IS the linear one. U rides for free as
    V minus the DFT of the (J-1)-sample tail.

    Experimental alternative to the Pallas shift-stack kernel (its grid
    step is VMEM-bandwidth-bound on the stack build; the matmuls here
    are large and MXU-shaped but materialize (4, M, S, F) spectra in
    HBM — see PERF.md for the measured trade)."""
    p4, m, s, n = x.shape
    k = n - j + 1
    f = n // 2 + 1
    t = np.arange(n)[:, None] * np.arange(f)[None, :]
    ang = (2.0 * np.pi / n) * t
    cos_m = jnp.asarray(np.cos(ang), x.dtype)  # (N, F)
    sin_m = jnp.asarray(np.sin(ang), x.dtype)
    alpha = np.full(f, 2.0)
    alpha[0] = 1.0
    if n % 2 == 0:
        alpha[-1] = 1.0
    lags = np.arange(j)[None, :] * np.arange(f)[:, None]
    angl = (2.0 * np.pi / n) * lags
    wc = jnp.asarray(np.cos(angl) * alpha[:, None] / n, x.dtype)  # (F, J)
    ws = jnp.asarray(np.sin(angl) * alpha[:, None] / n, x.dtype)

    pet = x.dtype
    v_re = jnp.einsum("pmst,tf->pmsf", x, cos_m, preferred_element_type=pet)
    v_im = -jnp.einsum("pmst,tf->pmsf", x, sin_m, preferred_element_type=pet)
    tail = x[..., k:]  # (.., J-1) at positions k..n-1
    u_re = v_re - jnp.einsum(
        "pmsu,uf->pmsf", tail, cos_m[k:], preferred_element_type=pet
    )
    u_im = v_im + jnp.einsum(
        "pmsu,uf->pmsf", tail, sin_m[k:], preferred_element_type=pet
    )
    # conj(U) V summed over mics: G = sum_m conj(U[s1]) V[s2] per bin.
    g_re = jnp.einsum(
        "pmaf,pmbf->pabf", u_re, v_re, preferred_element_type=pet
    ) + jnp.einsum("pmaf,pmbf->pabf", u_im, v_im, preferred_element_type=pet)
    g_im = jnp.einsum(
        "pmaf,pmbf->pabf", u_re, v_im, preferred_element_type=pet
    ) - jnp.einsum("pmaf,pmbf->pabf", u_im, v_re, preferred_element_type=pet)
    return jnp.einsum(
        "pabf,fl->pabl", g_re, wc, preferred_element_type=pet
    ) - jnp.einsum("pabf,fl->pabl", g_im, ws, preferred_element_type=pet)


def _compute_c0(buf: jax.Array, j: int, c0_method: str) -> jax.Array:
    """Dispatch the full-window correlation stage: (4, s1, s2, J)."""
    k = buf.shape[-1] - j + 1
    if c0_method == "auto":
        c0_method = (
            "pallas"
            if buf.dtype == jnp.float32 and jax.default_backend() == "tpu"
            else "conv"
        )
    if c0_method == "pallas":
        from apvast_tpu.ops.pallas.lag_corr import lag_corr_pallas

        return lag_corr_pallas(buf, j, interpret=(jax.default_backend() == "cpu"))
    if c0_method == "conv":
        if jax.default_backend() == "tpu":
            # The grouped-conv lowering is numerically WRONG on the TPU
            # runtime (measured 2026-08-18: 0.39 max rel error vs a
            # float64 oracle on north-star shapes, while the Pallas
            # kernel lands at 1.2e-4 = bf16 MXU rounding). Refuse
            # rather than return silently-garbage statistics; "auto"
            # never selects conv on TPU.
            raise ValueError(
                "c0_method='conv' mis-lowers on TPU (0.39 rel err vs "
                "oracle); use 'pallas' (production) or 'matmul'"
            )
        return _c0_conv(buf, k)
    if c0_method == "matmul":
        return _c0_matmul(buf, k)
    if c0_method == "fft":
        return _c0_fft(buf, j)
    # An unknown method must not silently fall through to the slowest
    # variant (_c0_matmul materializes ~200 MB of shift stacks per
    # path-mic at north-star scale): a perf experiment's typo would
    # read as a silently wrong measurement.
    raise ValueError(f"unknown c0_method: {c0_method!r}")


def covariance_via_lags(
    buf: jax.Array,
    d: jax.Array,
    j: int,
    c0_method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Spatial-correlation statistics from lag correlations.

    Args:
        buf: (4, M, S, N) weighted-response statistics buffers (the
            PYTHON-variant sample deletion already applied by the caller,
            as for the Pallas kernel path).
        d: (2, M, K) weighted target buffers aligned to the K frames.
        j: filter length J.
        c0_method: "pallas" (in-VMEM shift-stack matmul kernel — TPU
            float32 production), "conv" (grouped lax.conv) or "matmul"
            (shift-stack einsum scanned over mics), or "auto" (pallas
            on a float32 TPU trace, conv otherwise).

    Returns:
        (r_mats (4, S*J, S*J), r_vecs (2, S*J)) — numerically equal (up
        to summation order) to the framed-einsum reference path.
    """
    p4, m, s, n = buf.shape
    k = n - j + 1
    if d.shape[-1] != k:
        raise ValueError(f"target buffer must have K={k} samples")
    dtype = buf.dtype

    # ---- (i) full-window correlations at J lags -------------------------
    c0 = _compute_c0(buf, j, c0_method)  # (4, s1, s2, J)

    t_tab = lag_tables(buf, c0, j)
    r_mats = assemble_lag_matrices(t_tab, j)
    r_vecs = cross_lag_vectors(buf, d, j)
    return r_mats, r_vecs


def _edge_tables(x1e, x2e, j: int):
    """x1e: (4, m, s, E1), x2e: (4, m, s, E2) with E2 >= E1 + J - 1
    conceptually (shorter is zero-padded); returns D[p, s1, s2, i, l]
    = sum_m x1e[m,s1,i] * x2e[m,s2,i+l] for i in [0,E1), l in [0,J)."""
    dtype = x1e.dtype
    e1 = x1e.shape[-1]
    o = jnp.einsum(
        "pmsi,pmtv->psitv", x1e, x2e, preferred_element_type=dtype
    )  # (4, s1, i, s2, v)
    # Shear each (i, v) panel to diagonals: D[i, l] = O[i, i + l]
    # == flatten with row stride E2+1 (pure reshape, no gather).
    e2 = x2e.shape[-1]
    need = e1 * (e2 + 1)
    o = o.transpose(0, 1, 3, 2, 4)  # (4, s1, s2, i, v)
    flat = o.reshape(*o.shape[:-2], e1 * e2)
    flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, need - e1 * e2)])
    d_tab = flat.reshape(*flat.shape[:-1], e1, e2 + 1)[..., :j]
    return d_tab


def lag_tables(buf: jax.Array, c0: jax.Array, j: int) -> jax.Array:
    """Diagonal tables T[p, s1, s2, a, l] = C_{a, a+l} from the full-window
    correlations plus the two edge prefix corrections.

    PP[a, l] = sum_{i=1..a} x1[k-1+i] x2[k-1+i+l] is a diagonal prefix
    sum of the mic-summed OUTER PRODUCT of the edge snippets — one
    (S E x M)(M x S E) matmul per edge + a gather-free diagonal shear +
    a cumsum, instead of sliding-window stacks (which streamed ~700
    us/hop of awkward slabs through VMEM on the north-star trace)."""
    n = buf.shape[-1]
    k = n - j + 1
    # Right edge: i = 1..J-1 lives at buf[k-1+i]; x2 window reaches
    # k-1+i+l <= n-1 for all read entries (a+l <= J-1).
    x1r = buf[..., k - 1 : k - 1 + j]  # (4, m, s, J)
    x2r = buf[..., k - 1 :]  # (4, m, s, J)
    k_r = _edge_tables(x1r, x2r, j)  # (4, s1, s2, i, l)
    kc = jnp.cumsum(k_r, axis=3)
    pp = kc - kc[..., :1, :]

    # Left edge: PM[a, l] = sum_{u=0..a-1} x1[u] x2[u+l]; PM[0] = 0.
    if j > 1:
        x1l = buf[..., : j - 1]  # (4, m, s, J-1)
        x2l = buf[..., : 2 * j - 2]  # (4, m, s, 2J-2) covers u+l <= 2J-3
        k_l = _edge_tables(x1l, x2l, j)  # (4, s1, s2, u, l)
        pm = jnp.concatenate(
            [jnp.zeros_like(k_l[..., :1, :]), jnp.cumsum(k_l, axis=3)],
            axis=3,
        )  # (4, s1, s2, a, l)
    else:
        pm = jnp.zeros_like(pp)

    return c0[..., None, :] + pp - pm  # (4, s1, s2, a, l)


def assemble_lag_matrices(t_tab: jax.Array, j: int) -> jax.Array:
    """Diagonal tables -> (P, S*J, S*J) covariance matrices, gather-free."""
    p4, s = t_tab.shape[0], t_tab.shape[1]
    up = _shear_tables(t_tab)  # valid on t1 >= t2
    low = jnp.swapaxes(
        _shear_tables(jnp.swapaxes(t_tab, 1, 2)), -1, -2
    )  # C^{(s1,s2)}_{a,b} = C^{(s2,s1)}_{b,a} covers t1 < t2
    tril = np.tril(np.ones((j, j), dtype=bool))
    block = jnp.where(jnp.asarray(tril), up, low)
    return block.transpose(0, 1, 3, 2, 4).reshape(p4, s * j, s * j)


def cross_lag_vectors(buf: jax.Array, d: jax.Array, j: int) -> jax.Array:
    """r[z, s, tap] = sum_{m,t} x[pz, m, s, t + (J-1-tap)] d[z, m, t]:
    correlate against the zero-padded target shifted to each lag."""
    s = buf.shape[2]
    r_corr = _cross_corr(buf, d, j)  # (2, s, a)
    return jnp.flip(r_corr, axis=-1).reshape(2, s * j)


def _cross_corr(buf: jax.Array, d: jax.Array, j: int) -> jax.Array:
    """Raw bright-path lag correlations r_corr[z, s, a] (shared by the
    source- and tap-major layouts; only the final flatten differs)."""
    dtype = buf.dtype
    dp = jnp.pad(d, ((0, 0), (0, 0), (0, j - 1)))  # (2, m, n)
    d_shift = jnp.stack(
        [jnp.roll(dp, a, axis=-1) for a in range(j)], axis=2
    )  # (2, m, J, n); wrapped samples land in the zero padding
    x_bright = buf[jnp.asarray([0, 3])]  # bright paths A->A, B->B
    return jnp.einsum(
        "zmsu,zmau->zsa", x_bright, d_shift, preferred_element_type=dtype
    )


def _shear_rows_inc(x: jax.Array, sigma: int, w_out: int) -> jax.Array:
    """out[..., r, q] = x[..., r, q + r*sigma] — the gather-free linear
    shear: flatten rows contiguously, then REINTERPRET with row stride
    w + sigma (pure pad + reshape + slice). Positions reading past a
    row's end spill into the next row's data (defined garbage) — callers
    must consume only entries with q + r*sigma < w."""
    *lead, r, w = x.shape
    flat = x.reshape(*lead, r * w)
    pad = r * (w + sigma) - r * w
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, pad)])
    return flat.reshape(*lead, r, w + sigma)[..., :w_out]


def _shear_rows_dec(x: jax.Array, sigma: int, w_out: int) -> jax.Array:
    """out[..., r, q] = x[..., r, q + (R-1-r)*sigma] (spill garbage as in
    :func:`_shear_rows_inc`): pad each row by sigma, flatten, drop the
    leading (R-1)*sigma, reinterpret at the original row stride."""
    *lead, r, w = x.shape
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, sigma)])
    flat = xp.reshape(*lead, r * (w + sigma))
    start = (r - 1) * sigma
    flat2 = jax.lax.slice_in_dim(flat, start, start + r * w, axis=-1)
    return flat2.reshape(*lead, r, w)[..., :w_out]


def _shear_rows_neg(x: jax.Array, sigma: int) -> jax.Array:
    """out[..., r, q] = x[..., r, q - r*sigma] (positions below a row's
    start wrap into the previous row's tail/padding — defined garbage)."""
    *lead, r, w = x.shape
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, sigma)])
    flat = xp.reshape(*lead, r * (w + sigma))
    flat2 = jax.lax.slice_in_dim(flat, 0, r * w, axis=-1)
    return flat2.reshape(*lead, r, w)


def covariance_via_lags_wide(
    buf: jax.Array,
    d: jax.Array,
    j: int,
    c0_method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Source-major statistics through the TAP-MAJOR assembly.

    :func:`covariance_via_lags` pays S^2 small per-source-pair diagonal
    shears (sub-128-lane relayouts — ~1.4 ms/hop at SJ=1600);
    :func:`covariance_via_lags_tap` assembles in two WIDE row-linear
    shears + one MXU matmul-cumsum, but hands the solver a
    symmetrically-PERMUTED pencil whose different Cholesky rounding
    measurably rotates a near-degenerate top eigenpair (0.43 dB rank-1
    contrast delta on the north-star scene — outside the production
    gate). This variant takes the fast assembly and then RELABELS the
    result back to source-major ordering with one (J,S,J,S)->(S,J,S,J)
    transpose (~2x matrix traffic): the solver sees the same entry
    values in the same ordering as the per-pair path, so its rounding
    matches the validated configuration, at the wide assembly's speed.
    """
    k = buf.shape[-1] - j + 1
    if d.shape[-1] != k:
        raise ValueError(f"target buffer must have K={k} samples")
    r_tap = _tap_major_matrix(buf, j, c0_method)
    p4, s = buf.shape[0], buf.shape[2]
    r_mats = (
        r_tap.reshape(p4, j, s, j, s)
        .transpose(0, 2, 1, 4, 3)
        .reshape(p4, s * j, s * j)
    )
    r_vecs = cross_lag_vectors(buf, d, j)
    return r_mats, r_vecs


def _c0_and_cross_fused(
    buf: jax.Array, d: jax.Array, j: int, c0_method: str
) -> tuple[jax.Array, jax.Array]:
    """Full-window correlations AND the bright-path cross-correlations
    from ONE correlation pass: the weighted target rides along as an
    extra 'source' row (zero-padded to the buffer length; zero rows on
    the dark paths), so the S+1-source correlation returns both
    C0[s1, s2, l] and r_corr[z, s, a] = sum_t d_z[t] x[s, t + a] without
    a separate roll-stack einsum (~100 us/hop at SJ=800)."""
    p4, m, s, n = buf.shape
    dpad = jnp.pad(d, ((0, 0), (0, 0), (0, j - 1)))  # (2, m, n)
    dz = jnp.zeros((p4, m, 1, n), buf.dtype)
    dz = dz.at[0, :, 0].set(dpad[0]).at[3, :, 0].set(dpad[1])
    ext = jnp.concatenate([buf, dz], axis=2)  # (4, m, s+1, n)
    c0e = _compute_c0(ext, j, c0_method)  # (4, s+1, s+1, J)
    c0 = c0e[:, :s, :s]
    # Row s1 = S (the target row) against every source: exactly the
    # bright-path lag correlations of cross_lag_vectors.
    r_corr = jnp.stack([c0e[0, s, :s], c0e[3, s, :s]])  # (2, s, J)
    return c0, r_corr


def covariance_via_lags_skew(
    buf: jax.Array,
    d: jax.Array,
    j: int,
    c0_method: str = "auto",
    interpret: bool | None = None,
    form: str = "full",
) -> tuple[jax.Array, jax.Array]:
    """Source-major lag statistics with the assembly fused into one
    scanned Pallas MXU kernel (ops/pallas/skew_assembly.py).

    ``form="half"`` returns M with R = M + M^T instead of R itself
    (strict-upper-tap lanes zeroed and tap-diagonal lanes halved inside
    the kernel): the symmetric completion's transpose + select pass over
    the (SJ, SJ) stack — ~215 MB of HBM traffic per hop at SJ=1600 —
    disappears, and symmetric consumers (the tracking GEVD solver)
    apply M and M^T as two MXU contractions with no materialized
    transpose.

    The pair/tap/wide variants above compute the diagonal tables and
    then pay separate relayout passes (shears, flips, transposes) to
    turn them into (SJ, SJ) matrices. This variant never materializes
    the tables: writing the output row band at tap t1 in OUTPUT lane
    coordinates (s2*J + t2) turns the whole chain into a per-band
    recursion

        row(t1) = shift_by_one_lane(row(t1+1)) + lhsT[a] @ rhs,
        row(J-1) = c0  (in output coordinates),    a = J-1-t1,

    because both the c0[t1-t2] broadcast and the edge-correction
    cumulative sum shift the same way when t1 steps down — and the
    rank-C update's rhs is band-independent. One matmul slice + one
    lane shift per band, output written directly source-major; only the
    symmetric upper-tap completion (transpose + select) remains in XLA.

    Numerically the same sums as :func:`covariance_via_lags` in a
    different association order (the edge matmul accumulates in f32 on
    the MXU).

    Args/returns as :func:`covariance_via_lags`.
    """
    from apvast_tpu.ops.pallas.skew_assembly import lag_skew_assemble

    p4, m, s, n = buf.shape
    k = n - j + 1
    if d.shape[-1] != k:
        raise ValueError(f"target buffer must have K={k} samples")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    c0, r_corr = _c0_and_cross_fused(buf, d, j, c0_method)
    # c0 in output coordinates: c0_sm[p, s1, s2*J + t2] = c0[s1, s2, J-1-t2].
    c0_sm = jnp.flip(c0, axis=-1).reshape(p4, s, s * j)

    # Edge factors (identical construction to the tap path: row i = 0
    # zeroed, right edge minus left edge stacked on the contraction
    # axis c = (mic, edge)).
    zero_col = jnp.zeros_like(buf[..., :1])
    x1r = jnp.concatenate([zero_col, buf[..., k : k + j - 1]], -1)
    x1l = jnp.concatenate([zero_col, -buf[..., : j - 1]], -1)
    x2r = buf[..., k - 1 : k - 1 + j]  # v -> buf[k-1+v]
    x2l = jnp.concatenate([zero_col, buf[..., : j - 1]], -1)  # v -> buf[v-1]
    lhs = jnp.stack([x1r, x1l], axis=2).reshape(p4, 2 * m, s, j)
    rhs = jnp.stack([x2r, x2l], axis=2).reshape(p4, 2 * m, s, j)
    # lhsT[p, a*S + s1, c]; rhs_sm[p, c, s2*J + t2] = x2[c][J-1-t2, s2].
    lhs_t = lhs.transpose(0, 3, 2, 1).reshape(p4, j * s, 2 * m)
    rhs_sm = jnp.flip(rhs, axis=-1).reshape(p4, 2 * m, s * j)

    if form not in ("full", "half"):
        raise ValueError(f"form must be 'full' or 'half', got {form!r}")
    low = lag_skew_assemble(
        lhs_t, rhs_sm, c0_sm, j, interpret=interpret,
        half_scaled=(form == "half"),
    ).reshape(p4, s * j, s * j)
    r_vecs = jnp.flip(r_corr, axis=-1).reshape(2, s * j)
    if form == "half":
        return low, r_vecs
    # Symmetric completion: the kernel writes valid values at t2 <= t1
    # (within every source block); R = R^T fills the rest. The flat
    # (SJ, SJ) mask select is the fast form: re-expressing it as a
    # broadcast (J, J) mask on the (S, J, S, J) view to avoid the big
    # boolean constant measured 4-10x SLOWER (S=32: 955 vs 91 us) —
    # the 5-D transpose it needs lowers far worse than the mask DMA.
    taps = jnp.arange(s * j) % j
    mask = taps[:, None] >= taps[None, :]
    r_mats = jnp.where(mask, low, jnp.swapaxes(low, -1, -2))
    return r_mats, r_vecs


def _tap_major_matrix(buf: jax.Array, j: int, c0_method: str) -> jax.Array:
    """The (4, SJ, SJ) tap-major covariance assembly (the matrix half
    of :func:`covariance_via_lags_tap`); shared with the wide variant
    so neither traces the cross-correlation pass twice."""

    p4, m, s, n = buf.shape
    k = n - j + 1
    dtype = buf.dtype

    c0 = _compute_c0(buf, j, c0_method)  # (4, s1, s2, l)
    c0_t = c0.transpose(0, 1, 3, 2)  # (4, s1, l, s2) — small

    # ---- edge-correction einsum ----------------------------------------
    # Operand rows i = 0..J-1 (i = 0 zeroed: the a = J-1 row has no edge
    # terms); columns v = i + l read the same shifted positions for both
    # edges, so (mic, edge) contract jointly.
    zero_col = jnp.zeros_like(buf[..., :1])
    x1r = jnp.concatenate([zero_col, buf[..., k : k + j - 1]], -1)
    x1l = jnp.concatenate([zero_col, -buf[..., : j - 1]], -1)
    x2r = buf[..., k - 1 : k - 1 + j]  # v -> buf[k-1+v]
    x2l = jnp.concatenate([zero_col, buf[..., : j - 1]], -1)  # v -> buf[v-1]
    # (4, m, 2, s, j) -> operands ordered for a layout-native GEMM:
    # output (p, i, s1, v', s2) with no operand or result transposes.
    # The x2 column axis is REVERSED (v' = J-1-v) so that the table's
    # l-flip is a free flip of this SMALL operand instead of a lane
    # reversal of the 5-D tensor, and the a-flip folds into the
    # cumulative-sum matmul below (row-reversed triangle). jnp.cumsum on
    # a middle axis and jnp.flip on an inner axis each cost O(J) passes /
    # sub-128-lane relayouts on TPU — measured 3.8 ms + 1.9 ms per hop at
    # SJ=1600, dwarfing everything else in the path.
    lhs = jnp.stack([x1r, x1l], axis=2).transpose(0, 1, 2, 4, 3)
    rhs = jnp.flip(jnp.stack([x2r, x2l], axis=2), axis=-1)
    rhs = rhs.transpose(0, 1, 2, 4, 3)
    lhs = lhs.reshape(p4, 2 * m, j, s)
    rhs = rhs.reshape(p4, 2 * m, j, s)
    o = jnp.einsum(
        "pcis,pcvt->pisvt", lhs, rhs, preferred_element_type=dtype
    )  # (4, i, s1, v', s2):  o[i, s1, v', s2] = E-term at column J-1-v'

    # Diagonals, l-reversed: E'[i, s1, l', s2] = E[i, s1, J-1-l', s2]
    #  = o[i, s1, v' = l'-i, s2] — one negative-direction wide shear.
    e_rev = _shear_rows_neg(o.reshape(p4, j, s * j * s), s)

    # Cumulative sum over i as an MXU matmul against a ROW-REVERSED
    # triangle: T_f[a'] = sum_{i <= J-1-a'} E'[i] — the a-flip is free.
    # HIGHEST precision: statistics feed Cholesky; bf16-input matmuls
    # would truncate the accumulation to 8 mantissa bits.
    cum_rev = jnp.asarray(
        np.tril(np.ones((j, j)))[::-1].copy(), dtype
    )
    t_f = jnp.einsum(
        "ai,piw->paw",
        cum_rev,
        e_rev,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    ).reshape(p4, j, s, j, s)
    # t_f[a', s1, l', s2] = T[J-1-a', s1, J-1-l', s2]: the doubly-flipped
    # diagonal tables. Add the (small, flipped) full-window correlations.
    b_tab = jnp.flip(c0_t, axis=2)[:, None] + t_f

    # ---- lower half: one decreasing shear ------------------------------
    low = _shear_rows_dec(
        b_tab.reshape(p4, j, s * j * s), s, s * j * s
    ).reshape(p4, j * s, j * s)

    # ---- symmetric upper half ------------------------------------------
    rows = np.arange(s * j) // s
    mask = jnp.asarray(rows[:, None] >= rows[None, :])
    r_mats = jnp.where(mask, low, jnp.swapaxes(low, -1, -2))
    return r_mats


def covariance_via_lags_tap(
    buf: jax.Array,
    d: jax.Array,
    j: int,
    c0_method: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Tap-major lag statistics: R'[(t1,s1),(t2,s2)] = R[(s1,t1),(s2,t2)].

    A symmetric permutation of the source-major statistics (same GEVD
    spectrum; eigenvectors/filters permute — the engine reshapes filters
    as (J, S) instead of (S, J)). The point of the permuted layout is the
    assembly: the source-major layout needs a J x J diagonal shear PER
    SOURCE PAIR (S^2 small misaligned relayouts — measured ~1.4 ms/hop at
    SJ=1600, dwarfing the correlation math), whereas tap-major rows group
    all sources at one tap, so the whole matrix is TWO wide row-linear
    shears (pad+reshape+slice over contiguous (S*J*S)-wide rows), one
    cumsum, and one 2D transpose for the symmetric upper half:

      R'[t1*S+s1, t2*S+s2] = C^{(s1,s2)}_{a, a+l},  a = J-1-t1, l = t1-t2
      C_{a,a+l} = C0[l] + sum_{i=1..a}( x1[K-1+i] x2[K-1+i+l]
                                       - x1[i-1]  x2[i-1+l] )

    The bracket is ONE einsum over a stacked (mic, edge) contraction axis
    (right-edge and negated left-edge snippets aligned so both read the
    same shifted column v = i+l), sheared to diagonal form and cumsummed.
    The strict upper triangle (t2 > t1) comes from symmetry (R is a Gram
    sum, R = R^T), via a plain (SJ, SJ) transpose + block-level select.

    Args/returns as :func:`covariance_via_lags`, with both outputs in
    tap-major ordering.
    """
    p4, m, s, n = buf.shape
    k = n - j + 1
    if d.shape[-1] != k:
        raise ValueError(f"target buffer must have K={k} samples")
    r_mats = _tap_major_matrix(buf, j, c0_method)
    # ---- cross-correlation vectors (tap-major flatten) -----------------
    r_corr = _cross_corr(buf, d, j)  # (2, s, a)
    r_vecs = jnp.flip(r_corr, axis=-1).transpose(0, 2, 1).reshape(2, j * s)
    return r_mats, r_vecs
