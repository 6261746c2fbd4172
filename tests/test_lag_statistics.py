"""Lag-domain statistics (ops/lag_statistics.py) vs the framed dense
Gram — the two must compute the SAME sums (different order), so float64
agreement is near machine precision, not a loose tolerance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig, ToeplitzVariant
from apvast_tpu.ops.framing import frame_buffer
from apvast_tpu.ops.lag_statistics import covariance_via_lags


def _reference_gram(buf, d, j, variant):
    """The hop's einsum path (engine/hop.py stage 4), verbatim."""
    frames = frame_buffer(buf, j, variant)
    m = buf.shape[1]
    s = buf.shape[2]
    k = frames.shape[-2]
    y = (
        jnp.flip(frames, axis=-1)
        .transpose(0, 1, 2, 4, 3)
        .reshape(4, m, s * j, k)
    )
    r_mats = jnp.einsum("pmak,pmbk->pab", y, y)
    r_vecs = jnp.einsum("zmak,zmk->za", y[jnp.asarray([0, 3])], d[..., -k:])
    return r_mats, r_vecs


@pytest.mark.parametrize("c0_method", ["conv", "matmul", "fft"])
@pytest.mark.parametrize("s,j,m,n", [(3, 16, 2, 80), (4, 7, 3, 40), (2, 1, 2, 12)])
def test_matches_dense_gram_float64(c0_method, s, j, m, n):
    rng = np.random.default_rng(11 + s + j)
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)))
    k = n - j + 1
    d = jnp.asarray(rng.standard_normal((2, m, k)))

    # The caller applies the PYTHON-variant deletion before the lag path,
    # so the oracle here is the MATLAB (contiguous) framing of the same
    # buffer — identical semantics to the pallas-branch contract.
    want_r, want_v = _reference_gram(buf, d, j, ToeplitzVariant.MATLAB)
    got_r, got_v = covariance_via_lags(buf, d, j, c0_method=c0_method)
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(want_r), rtol=1e-11, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-11, atol=1e-11
    )


def test_matches_dense_gram_float32():
    rng = np.random.default_rng(3)
    buf = jnp.asarray(
        rng.standard_normal((4, 2, 3, 120)), dtype=jnp.float32
    )
    j = 20
    d = jnp.asarray(
        rng.standard_normal((2, 2, 101)), dtype=jnp.float32
    )
    want_r, want_v = _reference_gram(buf, d, j, ToeplitzVariant.MATLAB)
    got_r, got_v = covariance_via_lags(buf, d, j)
    scale = float(jnp.abs(want_r).max())
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(want_r), rtol=2e-4, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=2e-4,
        atol=2e-5 * float(jnp.abs(want_v).max()),
    )


@pytest.mark.parametrize("s,j,m,n", [(3, 16, 2, 80), (4, 7, 3, 40), (2, 1, 2, 12)])
def test_tap_major_is_permuted_source_major(s, j, m, n):
    """covariance_via_lags_tap == the (s,t)->(t,s) symmetric permutation
    of the source-major statistics, to machine precision (same sums)."""
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_tap

    rng = np.random.default_rng(21 + s + j)
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)))
    k = n - j + 1
    d = jnp.asarray(rng.standard_normal((2, m, k)))
    r_src, v_src = covariance_via_lags(buf, d, j, c0_method="conv")
    r_tap, v_tap = covariance_via_lags_tap(buf, d, j, c0_method="conv")
    perm = (
        np.asarray(r_src)
        .reshape(4, s, j, s, j)
        .transpose(0, 2, 1, 4, 3)
        .reshape(4, s * j, s * j)
    )
    permv = np.asarray(v_src).reshape(2, s, j).transpose(0, 2, 1).reshape(2, s * j)
    scale = np.abs(perm).max()
    np.testing.assert_allclose(np.asarray(r_tap), perm, rtol=1e-12, atol=1e-12 * scale)
    np.testing.assert_allclose(
        np.asarray(v_tap), permv, rtol=1e-12, atol=1e-12 * np.abs(permv).max()
    )


def test_tap_major_matrices_symmetric():
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_tap

    rng = np.random.default_rng(5)
    buf = jnp.asarray(rng.standard_normal((4, 2, 3, 60)))
    d = jnp.asarray(rng.standard_normal((2, 2, 51)))
    r_tap, _ = covariance_via_lags_tap(buf, d, 10, c0_method="conv")
    np.testing.assert_allclose(
        np.asarray(r_tap),
        np.swapaxes(np.asarray(r_tap), -1, -2),
        rtol=0,
        atol=1e-12 * float(jnp.abs(r_tap).max()),
    )


def test_wide_equals_pair_assembly():
    """covariance_via_lags_wide: same VALUES in the same source-major
    ordering as the per-pair path (the tap-major compute differs only in
    edge-cumsum summation order — f32-tight)."""
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_wide

    rng = np.random.default_rng(31)
    s, j, m, n = 4, 9, 3, 70
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)))
    d = jnp.asarray(rng.standard_normal((2, m, n - j + 1)))
    r_pair, v_pair = covariance_via_lags(buf, d, j, c0_method="conv")
    r_wide, v_wide = covariance_via_lags_wide(buf, d, j, c0_method="conv")
    scale = float(jnp.abs(r_pair).max())
    np.testing.assert_allclose(
        np.asarray(r_wide), np.asarray(r_pair), rtol=1e-12, atol=1e-12 * scale
    )
    np.testing.assert_allclose(np.asarray(v_wide), np.asarray(v_pair), rtol=1e-12)


@pytest.mark.parametrize(
    "s,j,m,n", [(3, 16, 2, 80), (4, 7, 3, 40), (2, 1, 2, 12), (16, 50, 3, 140)]
)
def test_skew_equals_pair_assembly(s, j, m, n):
    """covariance_via_lags_skew (the scanned Pallas assembly kernel,
    interpret mode): same source-major VALUES as the per-pair path to
    machine precision — the shift-recursion writes the same sums."""
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_skew

    rng = np.random.default_rng(41 + s + j)
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)))
    d = jnp.asarray(rng.standard_normal((2, m, n - j + 1)))
    r_pair, v_pair = covariance_via_lags(buf, d, j, c0_method="conv")
    r_skew, v_skew = covariance_via_lags_skew(buf, d, j, c0_method="conv")
    scale = float(jnp.abs(r_pair).max())
    np.testing.assert_allclose(
        np.asarray(r_skew), np.asarray(r_pair), rtol=1e-12, atol=1e-13 * scale
    )
    np.testing.assert_allclose(np.asarray(v_skew), np.asarray(v_pair), rtol=1e-12)
    # Exact symmetry by construction (transpose + select completion).
    np.testing.assert_array_equal(
        np.asarray(r_skew), np.swapaxes(np.asarray(r_skew), -1, -2)
    )


@pytest.mark.parametrize(
    "s,j,m,n", [(3, 16, 2, 80), (4, 7, 3, 40), (16, 50, 3, 140)]
)
def test_skew_half_form_completes_to_full(s, j, m, n):
    """form='half' returns M with M + M^T == the completed full matrix
    (round 5: the tracking solver consumes M directly, skipping the
    transpose + select completion pass). The kernel masks at write time:
    strict-upper-tap lanes zeroed, tap-diagonal halved."""
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_skew

    rng = np.random.default_rng(17 + s + j)
    buf = jnp.asarray(rng.standard_normal((4, m, s, n)))
    d = jnp.asarray(rng.standard_normal((2, m, n - j + 1)))
    r_full, v_full = covariance_via_lags_skew(buf, d, j, c0_method="conv")
    r_half, v_half = covariance_via_lags_skew(
        buf, d, j, c0_method="conv", form="half"
    )
    scale = float(jnp.abs(r_full).max())
    got = np.asarray(r_half) + np.swapaxes(np.asarray(r_half), -1, -2)
    np.testing.assert_allclose(
        got, np.asarray(r_full), rtol=1e-12, atol=1e-12 * scale
    )
    np.testing.assert_array_equal(np.asarray(v_half), np.asarray(v_full))
    # The strict-upper-tap region is exactly zero (no garbage survives).
    taps = np.arange(s * j) % j
    upper = taps[:, None] < taps[None, :]
    assert np.all(np.asarray(r_half)[:, upper] == 0.0)


@pytest.mark.parametrize("assembly", ["pair", "wide", "tap", "skew"])
@pytest.mark.parametrize("variant", list(ToeplitzVariant))
def test_engine_hop_with_lag_statistics(small_scene, variant, assembly):
    """process_hop(use_lag_statistics=True) == the einsum engine, both
    Toeplitz variants and all assembly layouts, float64. The tap-major
    run solves the GEVD on the permuted pencil, so the comparison allows
    for eigensolver roundoff reordering (still float64-tight)."""
    from apvast_tpu.engine import build_plan, init_state, process_hop

    config, rir_a, rir_b = small_scene
    tap = assembly == "tap"
    base = dataclasses.replace(config, toeplitz_variant=variant)
    lag = dataclasses.replace(
        base, use_lag_statistics=True, lag_assembly=assembly
    )

    rng = np.random.default_rng(8)
    outs = {}
    for name, cfg in (("base", base), ("lag", lag)):
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b, c=cfg, p=plan: process_hop(c, p, s, a, b))
        r = np.random.default_rng(8)
        for _ in range(3):
            state, out = fn(
                state,
                jnp.asarray(r.standard_normal(cfg.hop)),
                jnp.asarray(r.standard_normal(cfg.hop)),
            )
        outs[name] = np.asarray(out.out_a)
    scale = np.abs(outs["base"]).max()
    tol = 1e-7 if tap else 1e-9
    np.testing.assert_allclose(
        outs["lag"], outs["base"], rtol=tol, atol=tol * scale
    )


@pytest.mark.parametrize("n", [60, 61])  # odd AND even buffer lengths
def test_fft_c0_matches_matmul(n):
    """The half-spectrum DFT-matmul correlation (`c0_method='fft'`,
    experimental — measured 2.2x SLOWER than the Pallas shift-stack
    kernel on TPU, tools/c0_fft_lab.py, kept as engineering record) is
    the same sums: exact in float64 including the even-length Nyquist
    fold weight."""
    from apvast_tpu.ops.lag_statistics import _c0_fft, _c0_matmul

    rng = np.random.default_rng(17)
    buf = jnp.asarray(rng.standard_normal((4, 3, 4, n)))
    j = 9
    k = n - j + 1
    want = np.asarray(_c0_matmul(buf, k))
    got = np.asarray(_c0_fft(buf, j))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_c0_matches_conv_interpret():
    """The in-VMEM shift-stack kernel (interpret mode) == the conv/matmul
    correlations, float32."""
    from apvast_tpu.ops.lag_statistics import _c0_conv
    from apvast_tpu.ops.pallas.lag_corr import lag_corr_pallas

    rng = np.random.default_rng(13)
    buf = jnp.asarray(
        rng.standard_normal((4, 3, 4, 60)), dtype=jnp.float32
    )
    j = 9
    k = 60 - j + 1
    want = np.asarray(_c0_conv(buf, k))
    got = np.asarray(lag_corr_pallas(buf, j, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_covariance_pallas_c0_end_to_end_interpret():
    rng = np.random.default_rng(14)
    buf = jnp.asarray(
        rng.standard_normal((4, 2, 3, 50)), dtype=jnp.float32
    )
    j = 8
    d = jnp.asarray(rng.standard_normal((2, 2, 43)), dtype=jnp.float32)
    want_r, want_v = covariance_via_lags(buf, d, j, c0_method="conv")
    got_r, got_v = covariance_via_lags(buf, d, j, c0_method="pallas")
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(want_r), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5
    )


def test_pallas_c0_bf16_stack_interpret():
    """The bf16 shift-stack variant (the TPU default; bit-identical on
    the MXU, where f32 matmuls round operands to bf16 anyway) stays
    within bf16 working accuracy in interpret mode, where the matmul
    genuinely computes at bf16 input precision."""
    from apvast_tpu.ops.lag_statistics import _c0_conv
    from apvast_tpu.ops.pallas.lag_corr import lag_corr_pallas

    rng = np.random.default_rng(15)
    buf = jnp.asarray(
        rng.standard_normal((4, 3, 4, 60)), dtype=jnp.float32
    )
    j = 9
    k = 60 - j + 1
    want = np.asarray(_c0_conv(buf, k))
    got = np.asarray(
        lag_corr_pallas(buf, j, interpret=True, stack_dtype=jnp.bfloat16)
    )
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 3e-2


def test_c0_conv_rejected_on_tpu_backend(monkeypatch):
    """c0_method='conv' must refuse on a TPU backend: the grouped-conv
    lowering mis-computes there (0.39 rel err vs oracle, measured)."""
    from apvast_tpu.ops import lag_statistics

    rng = np.random.default_rng(16)
    buf = jnp.asarray(rng.standard_normal((4, 2, 3, 50)), jnp.float32)
    monkeypatch.setattr(
        lag_statistics.jax, "default_backend", lambda: "tpu"
    )
    with pytest.raises(ValueError, match="mis-lowers on TPU"):
        lag_statistics._compute_c0(buf, 8, "conv")
