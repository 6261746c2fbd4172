"""Truncated time-domain perceptual weighting (ops/weighting_conv.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.ops.weighting_conv import (
    circular_weighting_conv,
    weighting_kernel,
)


def test_conv_matches_spectral_roundtrip_for_bandlimited_kernel():
    """When the weighting's true impulse response fits inside T taps,
    the banded convolution must equal irfft(W * rfft(x)) exactly."""
    rng = np.random.default_rng(7)
    n, taps = 96, 17
    h = taps // 2
    # Build a weighting whose kernel is exactly supported on [-h, h]:
    # symmetric short kernel -> real one-sided spectrum.
    c = np.zeros(n)
    c[0] = 1.0
    body = rng.standard_normal(h) * 0.3
    c[1 : h + 1] = body
    c[n - h :] = body[::-1]
    w = np.fft.rfft(c).real  # (bins,) real by symmetry
    assert np.abs(np.fft.rfft(c).imag).max() < 1e-12

    p, m, s = 4, 2, 3
    x = rng.standard_normal((p, m, s, n))
    weighting = np.broadcast_to(w, (2, m, w.shape[0])).copy()
    # Per-(zone, mic) distinct scaling exercises the zone mapping.
    scales = rng.uniform(0.5, 2.0, (2, m))
    weighting = weighting * scales[..., None]

    kern = weighting_kernel(jnp.asarray(weighting), n, taps)
    got = np.asarray(
        circular_weighting_conv(jnp.asarray(x), kern, taps)
    )
    # Path order is 2*signal + zone: path p uses zone p % 2.
    w_by_path = weighting[[0, 1, 0, 1]]
    want = np.fft.irfft(
        np.fft.rfft(x, axis=-1) * w_by_path[:, :, None, :], n, axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("block_b", [None, 24, 48])
def test_conv_blocking_invariance(block_b):
    rng = np.random.default_rng(9)
    n, taps = 48, 9
    x = jnp.asarray(rng.standard_normal((4, 1, 2, n)))
    w = jnp.asarray(rng.uniform(0.5, 1.5, (2, 1, n // 2 + 1)))
    kern = weighting_kernel(w, n, taps)
    ref = circular_weighting_conv(x, kern, taps, block_b=n)
    got = circular_weighting_conv(x, kern, taps, block_b=block_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


def test_engine_exact_when_weighting_is_identity(small_scene):
    """perceptual=False makes the weighting all-ones, whose kernel is a
    single delta tap — truncation is then exact and the conv engine must
    reproduce the spectral engine to rounding."""
    from apvast_tpu.engine import build_plan, init_state, process_hop

    config, rir_a, rir_b = small_scene
    base = dataclasses.replace(config, perceptual=False)
    conv = dataclasses.replace(base, weighting_conv_taps=9)

    outs = {}
    for name, cfg in (("base", base), ("conv", conv)):
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b, c=cfg, p=plan: process_hop(c, p, s, a, b))
        rng = np.random.default_rng(4)
        for _ in range(3):
            state, out = fn(
                state,
                jnp.asarray(rng.standard_normal(cfg.hop)),
                jnp.asarray(rng.standard_normal(cfg.hop)),
            )
        outs[name] = np.asarray(out.out_a)
    scale = np.abs(outs["base"]).max()
    np.testing.assert_allclose(
        outs["conv"], outs["base"], rtol=1e-9, atol=1e-10 * scale
    )


def test_engine_perceptual_truncation_close(small_scene):
    """perceptual=True with a generous tap budget: outputs stay finite
    and near the exact engine (the kernel decays, so truncation error is
    small but nonzero)."""
    from apvast_tpu.engine import build_plan, init_state, process_hop

    config, rir_a, rir_b = small_scene
    base = dataclasses.replace(config, perceptual=True)
    conv = dataclasses.replace(
        base, weighting_conv_taps=config.block_size // 2 - 1
    )

    outs = {}
    for name, cfg in (("base", base), ("conv", conv)):
        plan = build_plan(cfg, rir_a, rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b, c=cfg, p=plan: process_hop(c, p, s, a, b))
        rng = np.random.default_rng(4)
        for _ in range(4):
            state, out = fn(
                state,
                jnp.asarray(rng.standard_normal(cfg.hop)),
                jnp.asarray(rng.standard_normal(cfg.hop)),
            )
        outs[name] = np.asarray(out.out_a)
    assert np.isfinite(outs["conv"]).all()
    scale = np.abs(outs["base"]).max()
    err = np.abs(outs["conv"] - outs["base"]).max() / scale
    # Toy blocks (tiny bins count) give the weighting no room to decay,
    # so sample-level error is large here; production-scale quality is
    # gated by the contrast test below and tools/quality_gate.py.
    assert err < 0.6, err


@pytest.mark.slow
def test_bundled_scene_contrast_within_gate():
    """T=257 truncated weighting vs the exact engine on the bundled
    scene: acoustic contrast within the 0.25 dB production gate at rank
    1 and rank V (measured deltas 0.005 / 0.052 dB)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.quality_gate import contrasts

    from apvast_tpu.utils.scenes import reference_scene

    scene = reference_scene(perceptual=True)
    cfg = scene.config
    ranks = [0, cfg.num_eigenvectors - 1]
    base = contrasts(cfg, scene.rir_a, scene.rir_b, 10, ranks)
    conv = contrasts(
        dataclasses.replace(cfg, weighting_conv_taps=257),
        scene.rir_a,
        scene.rir_b,
        10,
        ranks,
    )
    for r in ranks:
        assert abs(base[r] - conv[r]) < 0.25, (r, base[r], conv[r])


def test_pallas_rowwise_conv_matches_einsum_interpret():
    """The in-VMEM row-wise kernel (interpret) == the einsum frames path,
    float32, including the circular wrap."""
    rng = np.random.default_rng(21)
    n, taps, b = 64, 9, 16
    x = jnp.asarray(rng.standard_normal((4, 2, 3, n)), dtype=jnp.float32)
    w = jnp.asarray(
        rng.uniform(0.5, 1.5, (2, 2, n // 2 + 1)), dtype=jnp.float32
    )
    kern = weighting_kernel(w, n, taps)
    ref = circular_weighting_conv(x, kern, taps, block_b=b, impl="einsum")
    got = circular_weighting_conv(x, kern, taps, block_b=b, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
