"""Pallas fused statistics kernel vs the XLA framing+einsum path
(interpret mode on CPU; the compiled path runs on TPU in bench)."""

import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ToeplitzVariant
from apvast_tpu.ops.framing import frame_buffer
from apvast_tpu.ops.pallas.statistics import covariance_pallas


def _xla_statistics(buffers, targets, j, variant):
    frames = frame_buffer(buffers, j, variant)
    p, m, s, k, _ = frames.shape
    y = jnp.flip(frames, axis=-1).transpose(0, 1, 2, 4, 3).reshape(p, m, s * j, k)
    r = jnp.einsum("pmak,pmbk->pab", y, y)
    d = targets[..., -k:]
    cross = jnp.einsum("pmak,zmk->paz", y, d)
    return r, cross


def test_matches_xla_matlab_variant(rng):
    buf = jnp.asarray(rng.standard_normal((2, 3, 2, 64)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 3, 64)).astype(np.float32))
    j = 8
    k = 64 - j + 1
    want_r, want_c = _xla_statistics(buf, tgt, j, ToeplitzVariant.MATLAB)
    got_r, got_c = covariance_pallas(buf, tgt[..., -k:], j, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=2e-5, atol=1e-4)


def test_matches_xla_python_variant(rng):
    """PYTHON variant = caller deletes buffer sample J before the kernel."""
    buf = jnp.asarray(rng.standard_normal((4, 2, 3, 50)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 2, 50)).astype(np.float32))
    j = 6
    k = 50 - j  # deleted-sample variant
    want_r, want_c = _xla_statistics(buf, tgt, j, ToeplitzVariant.PYTHON)
    deleted = jnp.concatenate([buf[..., :j], buf[..., j + 1 :]], axis=-1)
    got_r, got_c = covariance_pallas(deleted, tgt[..., -k:], j, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=2e-5, atol=1e-4)


def test_symmetry(rng):
    buf = jnp.asarray(rng.standard_normal((1, 2, 2, 40)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 2, 36)).astype(np.float32))
    r, _ = covariance_pallas(buf, tgt, 5, interpret=True)
    r = np.asarray(r)
    np.testing.assert_allclose(r[0], r[0].T, rtol=1e-5, atol=1e-5)


def test_covariance_split_matches_resident(rng):
    """The block-pair split kernel (large-SJ path) produces the same
    covariance and cross-correlation as the resident-tile kernel."""
    from apvast_tpu.ops.pallas.statistics import (
        _covariance_pallas_panels,
        covariance_pallas,
    )

    p, m, s, n, j = 4, 3, 4, 96, 8  # sj = 32, bs % j == 0 for nb in {2,4}
    buffers = jnp.asarray(
        rng.standard_normal((p, m, s, n)), jnp.float32
    )
    targets = jnp.asarray(
        rng.standard_normal((2, m, n - j + 1)), jnp.float32
    )
    r_ref, c_ref = covariance_pallas(buffers, targets, j, interpret=True)
    for nb in (2, 4):
        r_spl, c_spl = _covariance_pallas_panels(
            buffers, targets, j, True, nb
        )
        # Different dot shapes split the f32 accumulation differently;
        # agreement is at float32 rounding level relative to the scale.
        scale = float(np.max(np.abs(np.asarray(r_ref))))
        np.testing.assert_allclose(
            np.asarray(r_spl), np.asarray(r_ref), atol=1e-6 * scale
        )
        np.testing.assert_allclose(
            np.asarray(c_spl), np.asarray(c_ref), atol=1e-6 * scale
        )


def test_covariance_packed_matches_resident(rng):
    """The packed symmetric-tile-pair kernel (large-SJ path) produces
    the same covariance and cross-correlation as the resident kernel,
    including with a budget that forces a multi-call group split and an
    SJ that is not a multiple of the 128 tile (zero-padded rows)."""
    from apvast_tpu.ops.pallas.statistics import (
        _covariance_pallas_packed,
        covariance_pallas,
    )

    # sj = 300: 3 tiles of 128 with zero-padded rows (the 32-spk case,
    # SJ=1600 = 12.5 tiles, is likewise padded). One case keeps the
    # interpret-mode run inside the fast suite's budget.
    for s, j in ((3, 100),):
        n = 2 * j
        buffers = jnp.asarray(
            rng.standard_normal((2, 2, s, n)), jnp.float32
        )
        targets = jnp.asarray(
            rng.standard_normal((2, 2, n - j + 1)), jnp.float32
        )
        r_ref, c_ref = covariance_pallas(buffers, targets, j, interpret=True)
        scale = float(np.max(np.abs(np.asarray(r_ref))))
        k = n - j + 1
        one_group = 3 * 128 * k * 4 + 6 * 128 * 128 * 4 * 2 + 1
        # The tightest feasible budget: the top block-row alone (full
        # window fill + its 3 tile pairs) — forces maximal splitting.
        min_group = 3 * 128 * k * 4 + 3 * 128 * 128 * 4 * 2 + 1
        for budget in (one_group, min_group):
            r_pk, c_pk = _covariance_pallas_packed(
                buffers, targets, j, True, vmem_budget=budget
            )
            np.testing.assert_allclose(
                np.asarray(r_pk), np.asarray(r_ref), atol=1e-6 * scale
            )
            np.testing.assert_allclose(
                np.asarray(c_pk), np.asarray(c_ref), atol=1e-6 * scale
            )
