"""Pallas cyclic-Jacobi small eigensolver: schedule contract, accuracy
vs LAPACK on random/clustered/padded spectra, and solver/engine
equivalence with the exact Rayleigh-Ritz path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig, GevdSolver
from apvast_tpu.ops.jdiag import jdiag_topk, jdiag_topk_batched
from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh, tournament_schedule


def _sym(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return (x + np.swapaxes(x, -1, -2)) / 2


def test_tournament_schedule_covers_all_pairs():
    for n in (8, 16, 56, 64):
        src = tournament_schedule(n)  # asserts covering + period inside
        assert sorted(src) == list(range(n))  # a permutation


def test_jacobi_matches_lapack_random(rng):
    for n in (8, 24, 56):
        a = _sym(rng, (3, n, n))
        w, v = jacobi_eigh(jnp.asarray(a), sweeps=10, interpret=True)
        w_ref, _ = np.linalg.eigh(a.astype(np.float64))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-4)
        # Eigenpair residual + orthonormality (float32 level).
        res = a.astype(np.float64) @ np.asarray(v, np.float64) - np.asarray(
            w, np.float64
        )[:, None, :] * np.asarray(v, np.float64)
        assert np.max(np.abs(res)) < 5e-4
        gram = np.swapaxes(np.asarray(v, np.float64), 1, 2) @ np.asarray(
            v, np.float64
        )
        assert np.max(np.abs(gram - np.eye(n))) < 1e-4


def test_jacobi_clustered_spectrum(rng):
    """Near-degenerate eigenvalues: values still converge (vectors may
    rotate inside the cluster — only the eigenvalues and the residual
    are contracts)."""
    n = 40
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate(
        [np.full(8, 5.0), np.full(8, 5.0 + 1e-4), rng.uniform(-1, 1, n - 16)]
    )
    a = ((q * lam) @ q.T).astype(np.float32)
    a = (a + a.T) / 2
    w, v = jacobi_eigh(jnp.asarray(a)[None], sweeps=12, interpret=True)
    w_ref = np.linalg.eigh(a.astype(np.float64))[0]
    np.testing.assert_allclose(np.asarray(w[0]), w_ref, atol=5e-4)
    res = a.astype(np.float64) @ np.asarray(v[0], np.float64) - np.asarray(
        w[0], np.float64
    ) * np.asarray(v[0], np.float64)
    assert np.max(np.abs(res)) < 2e-3


def test_jacobi_padded_sizes(rng):
    """Non-multiple-of-8 n exercises the decoupled-pad-slot path."""
    for n in (6, 30, 53 + 1):  # 54 -> pad 56; 30 -> pad 32; 6 -> pad 8
        a = _sym(rng, (2, n, n))
        w, v = jacobi_eigh(jnp.asarray(a), sweeps=10, interpret=True)
        w_ref, _ = np.linalg.eigh(a.astype(np.float64))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-4)
        assert w.shape == (2, n) and v.shape == (2, n, n)


def test_topk_jacobi_matches_lapack_path(rng):
    """jdiag_topk_batched(small_eigh='jacobi') reproduces the LAPACK
    Rayleigh-Ritz eigenvalues and subspace on a PSD pencil batch."""
    n, k, top = 64, 24, 10
    xa = rng.standard_normal((2, n, n + 8))
    xb = rng.standard_normal((2, n, n + 8))
    a = jnp.asarray(xa @ np.swapaxes(xa, 1, 2), jnp.float32)
    b = jnp.asarray(
        xb @ np.swapaxes(xb, 1, 2) + 10 * np.eye(n), jnp.float32
    )
    q0 = jnp.asarray(rng.standard_normal((2, n, k)), jnp.float32)
    u1, d1, _, sil1 = jdiag_topk_batched(
        a, b, 1e-7, top, 40, q0, "cholqr2", "invert", "lapack"
    )
    assert int(sil1) == 0
    u2, d2, _, _ = jdiag_topk_batched(
        a, b, 1e-7, top, 40, q0, "cholqr2", "invert", "jacobi",
        jacobi_sweeps=10, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=5e-4, atol=1e-5
    )
    # Same invariant subspace: projector difference is small.
    for z in range(2):
        p1, _ = np.linalg.qr(np.asarray(u1[z], np.float64))
        p2, _ = np.linalg.qr(np.asarray(u2[z], np.float64))
        pr1 = p1 @ p1.T
        pr2 = p2 @ p2.T
        assert np.max(np.abs(pr1 - pr2)) < 5e-3


def test_engine_jacobi_matches_lapack(small_scene):
    """Full engine: the float32 production solver with the Pallas Jacobi
    Rayleigh-Ritz matches the LAPACK small-eigh rank-wise outputs."""
    from apvast_tpu.engine import build_plan, init_state, process_hop

    cfg0, rir_a, rir_b = small_scene
    outs = {}
    for eigh_kind in ("lapack", "jacobi"):
        cfg = dataclasses.replace(
            cfg0,
            dtype="float32",
            gevd_solver=GevdSolver.SUBSPACE,
            subspace_iters=8,
            small_eigh=eigh_kind,
            jacobi_sweeps=10,
        )
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, x, y: process_hop(cfg, plan, s, x, y))
        rng = np.random.default_rng(7)
        acc = []
        for _ in range(6):
            state, out = fn(
                state,
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            )
            acc.append(np.asarray(out.out_a))
        outs[eigh_kind] = np.stack(acc)
    scale = np.max(np.abs(outs["lapack"])) + 1e-12
    assert (
        np.max(np.abs(outs["lapack"] - outs["jacobi"])) / scale < 2e-3
    ), "jacobi small-eigh diverged from the lapack path"


@pytest.mark.slow
def test_north_star_production_solver_quality():
    """North-star scene (16 speakers, perceptual ON, JL=800): the full
    production solver stack (SUBSPACE + cholqr2 + invert whitening +
    Pallas Jacobi Rayleigh-Ritz, float32) matches the exact EIGH solver's
    rank-1 and rank-50 contrast within 0.25 dB. The Pallas data-path
    kernels are covered separately by element-exact tests; this gates the
    solver approximations at the scene the BASELINE north star names."""
    import numpy as np

    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.evaluation import acoustic_contrast_db, predict_pressure
    from apvast_tpu.utils.scenes import scale_scene

    scene = scale_scene(16)
    cfg0 = scene.config
    ranks = [0, cfg0.num_eigenvectors - 1]

    def contrasts(cfg):
        plan = build_plan(cfg, scene.rir_a, scene.rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
        rng = np.random.default_rng(4)
        outs = []
        for _ in range(10):
            state, out = fn(
                state,
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            )
            outs.append(np.asarray(out.out_a))
        res = {}
        for r in ranks:
            feeds = np.concatenate([o[r] for o in outs[5:]], axis=0)
            res[r] = float(
                acoustic_contrast_db(
                    predict_pressure(
                        jnp.asarray(feeds), jnp.asarray(scene.rir_a)
                    ),
                    predict_pressure(
                        jnp.asarray(feeds), jnp.asarray(scene.rir_b)
                    ),
                )
            )
        return res

    exact = contrasts(dataclasses.replace(cfg0, gevd_solver=GevdSolver.EIGH))
    prod = contrasts(
        dataclasses.replace(
            cfg0,
            gevd_solver=GevdSolver.SUBSPACE,
            subspace_oversample=10,
            subspace_iters=2,
            small_eigh="jacobi",
            jacobi_sweeps=3,
        )
    )
    for r in ranks:
        assert abs(exact[r] - prod[r]) < 0.25, (r, exact, prod)


def test_fused_subspace_matches_unfused(rng):
    """The fused Pallas subspace kernel reproduces the XLA-op path
    (same whitening, same CholeskyQR2, same Rayleigh-Ritz) on a PSD
    pencil batch."""
    n, k, top = 96, 32, 10
    xa = rng.standard_normal((2, n, n + 8))
    xb = rng.standard_normal((2, n, n + 8))
    a = jnp.asarray(xa @ np.swapaxes(xa, 1, 2), jnp.float32)
    b = jnp.asarray(
        xb @ np.swapaxes(xb, 1, 2) + 10 * np.eye(n), jnp.float32
    )
    q0 = jnp.asarray(rng.standard_normal((2, n, k)), jnp.float32)
    u1, d1, _, _ = jdiag_topk_batched(
        a, b, 1e-7, top, 30, q0, "cholqr2", "invert", "lapack"
    )
    u2, d2, _, sil = jdiag_topk_batched(
        a, b, 1e-7, top, 30, q0, "cholqr2", "invert", "lapack",
        interpret=True, fused_iteration=True,
    )
    assert int(sil) == 0
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=1e-3, atol=1e-5
    )
    for z in range(2):
        p1, _ = np.linalg.qr(np.asarray(u1[z], np.float64))
        p2, _ = np.linalg.qr(np.asarray(u2[z], np.float64))
        assert np.max(np.abs(p1 @ p1.T - p2 @ p2.T)) < 5e-3


def test_engine_fused_subspace_matches(small_scene):
    """Full engine with use_pallas_subspace: outputs match the unfused
    float32 production path."""
    from apvast_tpu.engine import build_plan, init_state, process_hop

    cfg0, rir_a, rir_b = small_scene
    outs = {}
    for fused in (False, True):
        cfg = dataclasses.replace(
            cfg0,
            dtype="float32",
            gevd_solver=GevdSolver.SUBSPACE,
            subspace_iters=8,
            subspace_oversample=10,  # V=6 + 10 = 16, multiple of 8
            small_eigh="jacobi",
            jacobi_sweeps=10,
            use_pallas_subspace=fused,
        )
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, x, y: process_hop(cfg, plan, s, x, y))
        rng = np.random.default_rng(7)
        acc = []
        for _ in range(6):
            state, out = fn(
                state,
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
                jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32),
            )
            acc.append(np.asarray(out.out_a))
        outs[fused] = np.stack(acc)
    scale = np.max(np.abs(outs[False])) + 1e-12
    assert np.max(np.abs(outs[False] - outs[True])) / scale < 5e-3


# ---------------------------------------------------------------------------
# Complex Hermitian path (symmetric embedding) — the FD engine's per-bin
# eigensolver (ops/pallas/jacobi_eigh.jacobi_eigh_hermitian).
# ---------------------------------------------------------------------------


def _herm(rng, bz, n, m=12):
    h = rng.standard_normal((bz, m, n)) + 1j * rng.standard_normal((bz, m, n))
    return np.einsum("bms,bmt->bst", h.conj(), h).astype(np.complex64)


def test_jacobi_hermitian_matches_lapack(rng):
    from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh_hermitian

    a = _herm(rng, 9, 8)
    w, v = jax.jit(
        lambda x: jacobi_eigh_hermitian(x, sweeps=8, interpret=True)
    )(a)
    w, v = np.asarray(w), np.asarray(v)
    wn = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(w, wn, rtol=2e-5, atol=2e-4 * np.abs(wn).max())
    # Residual + column orthonormality (phase-free checks: eigenvectors
    # are defined up to a complex phase).
    res = np.einsum("bij,bjk->bik", a, v) - v * w[:, None, :]
    assert np.max(np.abs(res)) < 5e-5 * np.max(np.abs(a))
    g = np.einsum("bij,bik->bjk", v.conj(), v)
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(8), g.shape), atol=1e-4)


def test_jacobi_hermitian_degenerate_pairs(rng):
    """ADVICE r4: coinciding eigenvalues must not yield phase-parallel
    duplicate eigenvectors. Exact 2-fold complex degeneracies (4-dim real
    eigenspaces of the symmetric embedding) are the worst case for the
    every-other-column selection; the re-pairing must keep the returned
    columns orthonormal and the residual small."""
    from apvast_tpu.ops.pallas.jacobi_eigh import jacobi_eigh_hermitian

    n, bz = 8, 6
    z = rng.standard_normal((bz, n, n)) + 1j * rng.standard_normal((bz, n, n))
    q, _ = np.linalg.qr(z)
    # Spectrum with two exact 2-fold degeneracies and a near-coincident
    # (1 ulp apart in float32) distinct pair.
    w0 = np.array(
        [1.0, 1.0, 2.0, 2.0, 3.0, np.float32(3.0) + np.spacing(np.float32(3.0)),
         5.0, 8.0],
        np.float64,
    )
    a = (q * w0[None, None, :].astype(q.dtype)) @ np.conj(
        q.swapaxes(-1, -2)
    )
    a = (0.5 * (a + np.conj(a.swapaxes(-1, -2)))).astype(np.complex64)
    w, v = jax.jit(
        lambda x: jacobi_eigh_hermitian(x, sweeps=10, interpret=True)
    )(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), atol=2e-4 * 8)
    g = np.einsum("bij,bik->bjk", v.conj(), v)
    np.testing.assert_allclose(
        g, np.broadcast_to(np.eye(n), g.shape), atol=5e-3
    )
    res = np.einsum("bij,bjk->bik", a, v) - v * w[:, None, :]
    assert np.max(np.abs(res)) < 1e-3 * np.max(np.abs(a))


def test_jdiag_hermitian_batched_jacobi_contract(rng):
    """eigh_impl='jacobi' keeps the GEVD contract U^H B_reg U = I and
    matches the LAPACK path's eigenvalues."""
    from apvast_tpu.ops.jdiag import jdiag_hermitian_batched

    a = _herm(rng, 7, 8)
    b = _herm(rng, 7, 8) + (0.1 * np.eye(8)).astype(np.complex64)
    u1, d1 = jdiag_hermitian_batched(jnp.asarray(a), jnp.asarray(b), 0.0)
    u2, d2 = jdiag_hermitian_batched(
        jnp.asarray(a), jnp.asarray(b), 0.0,
        eigh_impl="jacobi", jacobi_sweeps=10, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), rtol=5e-4,
        atol=1e-4 * float(np.abs(np.asarray(d1)).max()),
    )
    g = np.einsum(
        "bji,bjk,bkl->bil", np.asarray(u2).conj(), b, np.asarray(u2)
    )
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(8), g.shape), atol=5e-4)
