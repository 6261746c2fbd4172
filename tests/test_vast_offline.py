"""C10: offline VAST — the framed-RIR statistics against a direct
re-enactment of the reference's sliding convolution-matrix loop
(Matlab/ControlMethods/vast.m:50-77)."""

import jax.numpy as jnp
import numpy as np

from apvast_tpu.models.vast_offline import vast_offline, vast_statistics


def _loop_statistics(rir_b, rir_d, j, delay, ref, num_steps):
    """Direct translation of the vast.m accumulation semantics (0-based):
    y[s*J + r] at step n = rir[n - r, s, m]; d[n] = rir_b[n - delay, ref, m]
    for n < rir_length."""
    rl, s, m = rir_b.shape
    jl = j * s
    rb = np.zeros((jl, jl))
    rd = np.zeros((jl, jl))
    rv = np.zeros(jl)

    def lag_read(rir, n, r, si, mi):
        t = n - r
        return rir[t, si, mi] if 0 <= t < rl else 0.0

    for n in range(num_steps):
        for mi in range(m):
            yb = np.array(
                [lag_read(rir_b, n, r, si, mi) for si in range(s) for r in range(j)]
            )
            yd = np.array(
                [lag_read(rir_d, n, r, si, mi) for si in range(s) for r in range(j)]
            )
            d = rir_b[n - delay, ref, mi] if delay <= n < rl else 0.0
            rb += np.outer(yb, yb)
            rd += np.outer(yd, yd)
            rv += yb * d
    scale = 1.0 / (m * (rl - j))
    return rb * scale, rd * scale, rv * scale


def test_statistics_match_reference_loop(rng):
    rl, s, m, j, delay, ref, steps = 24, 2, 2, 6, 3, 1, 40
    rir_b = rng.standard_normal((rl, s, m))
    rir_d = rng.standard_normal((rl, s, m))
    want = _loop_statistics(rir_b, rir_d, j, delay, ref, steps)
    got = vast_statistics(
        jnp.asarray(rir_b), jnp.asarray(rir_d), j, delay, ref, steps
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-10, atol=1e-12)


def test_step_truncation_reproduced(rng):
    """num_steps < rir_length + J - 1 clips correlation lags exactly as
    the reference's hard-coded N=1000 does (vast.m:50)."""
    rl, s, m, j = 30, 1, 1, 8
    rir_b = rng.standard_normal((rl, s, m))
    rir_d = rng.standard_normal((rl, s, m))
    steps = 20  # far below rl + j - 1
    want = _loop_statistics(rir_b, rir_d, j, 2, 0, steps)
    got = vast_statistics(jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 0, steps)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-10, atol=1e-12)


def test_filter_endpoints(rng):
    """Rank family endpoints behave like BACC vs pressure matching: the
    full-rank solution tracks the target much more closely than rank 1."""
    rl, s, m, j = 40, 3, 2, 8
    rir_b = rng.standard_normal((rl, s, m)) * np.exp(-np.arange(rl) / 10)[:, None, None]
    rir_d = rng.standard_normal((rl, s, m)) * np.exp(-np.arange(rl) / 10)[:, None, None]
    family = vast_offline(
        jnp.asarray(rir_b),
        jnp.asarray(rir_d),
        j,
        2,
        0,
        num_eigenvectors=j * s,
        mu=1.0,
        num_steps=80,
        reg=1e-10,
        return_family=True,
    )
    assert family.shape == (j * s, j, s)
    assert np.all(np.isfinite(np.asarray(family)))
    # Later spans must not be identical to rank-1 (the family is strict).
    assert not np.allclose(np.asarray(family[0]), np.asarray(family[-1]))


def test_mu_grid_sweep_matches_single(rng):
    """The (mu x rank) surface equals per-mu single designs."""
    import jax.numpy as jnp

    from apvast_tpu.models.vast_offline import vast_offline_sweep

    rl, s, m, j = 30, 2, 2, 6
    rir_b = rng.standard_normal((rl, s, m))
    rir_d = rng.standard_normal((rl, s, m))
    mu_grid = np.array([0.3, 1.0, 3.0])
    surface = vast_offline_sweep(
        jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 1,
        num_eigenvectors=j * s, mu_grid=mu_grid, num_steps=40, reg=1e-10,
    )
    assert surface.shape == (3, j * s, j, s)
    for gi, mu in enumerate(mu_grid):
        single = vast_offline(
            jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 1,
            num_eigenvectors=j * s, mu=float(mu), num_steps=40, reg=1e-10,
            return_family=True,
        )
        np.testing.assert_allclose(
            np.asarray(surface[gi]), np.asarray(single), rtol=1e-9, atol=1e-11
        )


def test_acc_and_pressure_matching_endpoints(rng):
    from apvast_tpu.models.vast_offline import acc, pressure_matching
    import jax.numpy as jnp

    rl, s, m, j = 30, 2, 2, 6
    rir_b = rng.standard_normal((rl, s, m))
    rir_d = rng.standard_normal((rl, s, m))
    w_acc = acc(jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 0, num_steps=40, reg=1e-10)
    w_pm = pressure_matching(
        jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 0, num_steps=40, reg=1e-10
    )
    assert w_acc.shape == (j, s) and w_pm.shape == (j, s)
    want_acc = vast_offline(
        jnp.asarray(rir_b), jnp.asarray(rir_d), j, 2, 0,
        num_eigenvectors=1, mu=1.0, num_steps=40, reg=1e-10,
    )
    np.testing.assert_allclose(np.asarray(w_acc), np.asarray(want_acc))
