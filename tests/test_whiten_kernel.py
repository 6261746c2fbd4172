"""Fused Cholesky+inverse whitening-setup kernel (ops/pallas/whiten.py)
vs the XLA chain it replaces (jnp.linalg.cholesky +
ops/trisolve.triangular_inverse), in interpret mode on CPU.

The kernel computes the factorization the reference performs inside
eig(A, B, 'chol') / scipy.linalg.eigh every hop
(Matlab/GeneralPurpose/jdiag.m:12-14, Python/apvast.py:380-382).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.ops.pallas.whiten import chol_tri_inverse_pallas
from apvast_tpu.ops.trisolve import triangular_inverse


def _spd(rng, bz, n, boost=0.0):
    a = rng.standard_normal((bz, n, n)).astype(np.float32)
    spd = a @ a.transpose(0, 2, 1) / n + np.eye(n, dtype=np.float32)
    if boost:
        spd[0] += boost * np.outer(a[0, 0], a[0, 0]) / n
    return jnp.asarray(spd)


@pytest.mark.parametrize("n", [256, 320])
def test_matches_xla_chain(n):
    rng = np.random.default_rng(0)
    b = _spd(rng, 2, n)
    ref = triangular_inverse(jnp.linalg.cholesky(b.astype(jnp.float64)))
    out = chol_tri_inverse_pallas(b, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert (
        float(jnp.max(jnp.abs(out - ref.astype(jnp.float32)))) / scale < 1e-5
    )


def test_non_multiple_of_128_padding():
    """The 128-padding path: blkdiag(B, I) factorizes blockwise, so the
    sliced result must equal the unpadded contract."""
    rng = np.random.default_rng(1)
    n = 200
    b = _spd(rng, 1, n)
    ref = triangular_inverse(jnp.linalg.cholesky(b.astype(jnp.float64)))
    out = chol_tri_inverse_pallas(b, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert (
        float(jnp.max(jnp.abs(out - ref.astype(jnp.float32)))) / scale < 1e-5
    )
    # Strictly upper triangle must be exactly zero.
    upper = jnp.triu(out[0], k=1)
    assert float(jnp.max(jnp.abs(upper))) == 0.0


def test_whitening_residual_ill_conditioned():
    """The refined panel solves must hold the whitening residual
    ||Li B Li^T - I|| at or below the XLA chain's level on an
    ill-conditioned scene (the explicit-inverse multiply alone loses
    ~cond * eps; measured 2e0 without the refinement steps)."""
    rng = np.random.default_rng(2)
    n = 256
    b = _spd(rng, 2, n, boost=1e5)
    out = chol_tri_inverse_pallas(b, interpret=True)
    eye = jnp.eye(n, dtype=jnp.float32)
    res = out @ b @ out.transpose(0, 2, 1) - eye
    ref = triangular_inverse(jnp.linalg.cholesky(b))
    res_ref = ref @ b @ ref.transpose(0, 2, 1) - eye
    assert float(jnp.max(jnp.abs(res))) <= 2.0 * float(
        jnp.max(jnp.abs(res_ref))
    ) + 1e-5


def test_solver_path_equivalence():
    """jdiag_topk_batched with whiten_kernel=True must agree with the
    default invert path at the eigenpair level (same pencils, warm
    subspace)."""
    from apvast_tpu.ops.jdiag import jdiag_topk_batched

    rng = np.random.default_rng(3)
    n, k, v = 256, 24, 8
    a = _spd(rng, 2, n)
    b = _spd(rng, 2, n)
    q0 = jnp.asarray(rng.standard_normal((2, n, k)).astype(np.float32))
    kw = dict(
        reg=1e-3, num_vectors=v, iters=3, q_init=q0,
        orth="cholqr2", whiten="invert", interpret=True,
    )
    u_ref, d_ref, _, s_ref = jdiag_topk_batched(a, b, **kw)
    u_new, d_new, _, s_new = jdiag_topk_batched(
        a, b, whiten_kernel=True, **kw
    )
    assert int(s_ref) == 0 and int(s_new) == 0
    np.testing.assert_allclose(d_new, d_ref, rtol=2e-4)
    # Eigenvector sign freedom: compare subspace projectors per pencil.
    for z in range(2):
        p_ref = u_ref[z] @ u_ref[z].T
        p_new = u_new[z] @ u_new[z].T
        np.testing.assert_allclose(
            p_new, p_ref, atol=2e-3 * float(jnp.max(jnp.abs(p_ref)))
        )


def test_float64_rejected():
    b = jnp.eye(8, dtype=jnp.float64)[None]
    with pytest.raises(ValueError, match="float32"):
        chol_tri_inverse_pallas(b, interpret=True)


def test_vmem_bound_rejected():
    with pytest.raises(ValueError, match="VMEM"):
        chol_tri_inverse_pallas(
            jnp.eye(1280, dtype=jnp.float32)[None], interpret=True
        )


def test_blocked_cholesky_matches_xla():
    """Hybrid path: Pallas panel factorization + XLA trailing updates
    must reproduce jnp.linalg.cholesky to float32 working accuracy,
    including through the 128-padding path."""
    from apvast_tpu.ops.pallas.whiten import blocked_cholesky

    rng = np.random.default_rng(5)
    for n, boost in ((256, 0.0), (256, 1e5), (200, 0.0)):
        b = _spd(rng, 2, n, boost=boost)
        ref = jnp.linalg.cholesky(b)
        out = blocked_cholesky(b, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 5e-5
        res = out @ out.transpose(0, 2, 1) - b
        assert (
            float(jnp.max(jnp.abs(res))) / float(jnp.max(jnp.abs(b))) < 1e-5
        )
