"""Engine with use_pallas_statistics=True (interpret mode on CPU) must
match the XLA statistics path hop for hop."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig, ToeplitzVariant
from apvast_tpu.engine import build_plan, init_state, process_hop
from apvast_tpu.utils.rir import synthetic_rirs


def _run(cfg, rir_a, rir_b, hops=4):
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    rng = np.random.default_rng(2)
    outs = []
    for _ in range(hops):
        state, out = fn(
            state,
            jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32),
            jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32),
        )
        outs.append(np.asarray(out.out_a))
    return outs


def _cfg(variant):
    rir_a = synthetic_rirs(80, 3, 2, seed=61)
    rir_b = synthetic_rirs(80, 3, 2, seed=62)
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=128,
        filter_length=12,
        modeling_delay=4,
        reference_index_a=0,
        reference_index_b=1,
        num_eigenvectors=5,
        mu=1.0,
        statistics_buffer_length=128,
        sampling_rate=8000,
        perceptual=True,
        dtype="float32",
        toeplitz_variant=variant,
    )
    return cfg, rir_a, rir_b


def test_pallas_engine_matches_xla_python_variant():
    cfg, rir_a, rir_b = _cfg(ToeplitzVariant.PYTHON)
    want = _run(cfg, rir_a, rir_b)
    got = _run(
        dataclasses.replace(cfg, use_pallas_statistics=True), rir_a, rir_b
    )
    # float32 + a near-singular eigenproblem amplify benign
    # accumulation-order differences; structural indexing bugs would show
    # up as O(1) relative errors on most elements.
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0.05, atol=1e-4)


def test_pallas_engine_matches_xla_matlab_variant():
    cfg, rir_a, rir_b = _cfg(ToeplitzVariant.MATLAB)
    want = _run(cfg, rir_a, rir_b)
    got = _run(
        dataclasses.replace(cfg, use_pallas_statistics=True), rir_a, rir_b
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0.05, atol=1e-4)


def test_pallas_rejects_float64(small_scene):
    cfg, rir_a, rir_b = small_scene
    cfg = dataclasses.replace(cfg, use_pallas_statistics=True)
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    try:
        process_hop(cfg, plan, state, jnp.zeros(cfg.hop), jnp.zeros(cfg.hop))
        raise AssertionError("expected float32 requirement error")
    except ValueError as e:
        assert "float32" in str(e)


def test_pallas_output_matches_fft_path():
    """The circular-convolution output kernel equals the FFT synthesis."""
    cfg, rir_a, rir_b = _cfg(ToeplitzVariant.PYTHON)
    want = _run(cfg, rir_a, rir_b)
    got = _run(
        dataclasses.replace(cfg, use_pallas_output=True), rir_a, rir_b
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-6)


def test_pallas_output_target_roll(small_scene):
    """Target outputs (delta filter -> roll) match the FFT target path,
    including the PER_ZONE variant."""
    from apvast_tpu.config import TargetFilterVariant

    cfg, rir_a, rir_b = small_scene
    cfg = dataclasses.replace(
        cfg,
        dtype="float32",
        reference_index_a=1,
        reference_index_b=3,
        target_filter=TargetFilterVariant.PER_ZONE,
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(2))
    p_cfg = dataclasses.replace(cfg, use_pallas_output=True)
    p_plan = build_plan(p_cfg, rir_a, rir_b)
    p_state = init_state(p_cfg, key=jax.random.key(2))
    rng = np.random.default_rng(8)
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    pfn = jax.jit(lambda s, a, b: process_hop(p_cfg, p_plan, s, a, b))
    for _ in range(3):
        a = jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal(cfg.hop), dtype=jnp.float32)
        state, out = fn(state, a, b)
        p_state, p_out = pfn(p_state, a, b)
        np.testing.assert_allclose(
            np.asarray(p_out.out_a_t), np.asarray(out.out_a_t), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p_out.out_b_t), np.asarray(out.out_b_t), rtol=1e-4, atol=1e-6
        )


def test_pallas_conv_matches_fft_path():
    """The windows-matmul streaming convolution equals the FFT path."""
    cfg, rir_a, rir_b = _cfg(ToeplitzVariant.PYTHON)
    want = _run(cfg, rir_a, rir_b)
    got = _run(dataclasses.replace(cfg, use_pallas_conv=True), rir_a, rir_b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0.05, atol=1e-4)


def test_matmul_dft_matches_fft_path():
    """use_matmul_dft replaces WOLA FFTs with DFT matmuls — same outputs."""
    cfg, rir_a, rir_b = _cfg(ToeplitzVariant.PYTHON)
    want = _run(cfg, rir_a, rir_b)
    got = _run(dataclasses.replace(cfg, use_matmul_dft=True), rir_a, rir_b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0.05, atol=1e-4)
