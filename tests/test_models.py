"""Model-level behavior: the ApVast wrapper end-to-end, and the algorithm
actually doing its job (acoustic contrast) on a synthetic scene."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from apvast_tpu.evaluation.metrics import acoustic_contrast_db, predict_pressure
from apvast_tpu.models.apvast import ApVast
from apvast_tpu.utils.rir import synthetic_rirs


def _build(num_eig=8, perceptual=False, **kw):
    rir_a = synthetic_rirs(120, 4, 3, seed=21)
    rir_b = synthetic_rirs(120, 4, 3, seed=22)
    return (
        ApVast(
            block_size=256,
            rir_a=rir_a,
            rir_b=rir_b,
            filter_length=24,
            modeling_delay=6,
            reference_index_a=0,
            reference_index_b=0,
            number_of_eigenvectors=num_eig,
            mu=1.0,
            statistics_buffer_length=256,
            sampling_rate=8000,
            perceptual=perceptual,
            key=jax.random.key(0),
            **kw,
        ),
        rir_a,
        rir_b,
    )


def test_wrapper_shapes(rng):
    model, _, _ = _build()
    hop = model.config.hop
    out_a, out_b, out_a_t, out_b_t = model.process_input_buffers(
        rng.standard_normal(hop), rng.standard_normal(hop)
    )
    assert out_a.shape == (8, hop, 4)
    assert out_b.shape == (8, hop, 4)
    assert out_a_t.shape == (8, hop, 4)
    assert out_b_t.shape == (8, hop, 4)


def test_process_signals_matches_hop_loop(rng):
    sig_a = rng.standard_normal(128 * 4)
    sig_b = rng.standard_normal(128 * 4)
    m1, _, _ = _build()
    m2, _, _ = _build()
    full = m1.process_signals(sig_a, sig_b)[0]  # (V, T, S)
    pieces = []
    for h in range(4):
        out_a, *_ = m2.process_input_buffers(
            sig_a[h * 128 : (h + 1) * 128], sig_b[h * 128 : (h + 1) * 128]
        )
        pieces.append(np.asarray(out_a))
    want = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(np.asarray(full), want, rtol=1e-10, atol=1e-12)


def test_acoustic_contrast_tradeoff(rng):
    """The variable-span trade-off (apVast.m:113-122): acoustic contrast
    is clearly positive at every span and decreases from the BACC end
    (rank 1) to the pressure-matching end (full rank) as the filters trade
    contrast for target fidelity."""
    model, rir_a, rir_b = _build(num_eig=96)  # full rank = 24*4
    hop = model.config.hop
    sig_a = rng.standard_normal(hop * 12)
    sig_b = rng.standard_normal(hop * 12)
    out_a, out_b, *_ = model.process_signals(sig_a, sig_b)

    tail = slice(hop * 4, None)  # drop warmup

    def contrast(out, bright_rir, dark_rir, v):
        feeds = np.asarray(out[v])[tail]
        return float(
            acoustic_contrast_db(
                predict_pressure(feeds, bright_rir), predict_pressure(feeds, dark_rir)
            )
        )

    c_a = [contrast(out_a, rir_a, rir_b, v) for v in (0, 95)]
    c_b = [contrast(out_b, rir_b, rir_a, v) for v in (0, 95)]
    assert c_a[0] > 3.0, f"rank-1 contrast A {c_a[0]:.1f} dB"
    assert c_b[0] > 3.0, f"rank-1 contrast B {c_b[0]:.1f} dB"
    assert c_a[0] > c_a[1], f"contrast did not decrease with rank: {c_a}"
    assert c_b[0] > c_b[1], f"contrast did not decrease with rank: {c_b}"


def test_contrast_increases_with_rank(rng):
    """Bright-zone fidelity (target tracking) improves with span rank —
    the variable-span trade-off (apVast.m:113-122)."""
    model, rir_a, rir_b = _build(num_eig=96)  # full rank = 24*4
    hop = model.config.hop
    sig_a = rng.standard_normal(hop * 10)
    sig_b = rng.standard_normal(hop * 10)
    out_a, _, out_a_t, _ = model.process_signals(sig_a, sig_b)
    tail = slice(hop * 4, None)
    target = predict_pressure(np.asarray(out_a_t[0])[tail], rir_a)
    errs = []
    for v in (0, 95):
        pressure = predict_pressure(np.asarray(out_a[v])[tail], rir_a)
        errs.append(float(np.sum((pressure - target) ** 2) / np.sum(target**2)))
    assert errs[1] < errs[0], f"NMSE did not improve with rank: {errs}"


def test_custom_hop_size(rng):
    """hop_size != block/2 is parameterizable as in the Python reference
    (apvast.py:51,93); WOLA perfect reconstruction is only guaranteed at
    50% overlap (reference note apvast.py:93-94), but the engine must run
    and stay finite."""
    rir_a = synthetic_rirs(80, 3, 2, seed=31)
    rir_b = synthetic_rirs(80, 3, 2, seed=32)
    model = ApVast(
        block_size=128,
        rir_a=rir_a,
        rir_b=rir_b,
        filter_length=12,
        modeling_delay=4,
        reference_index_a=0,
        reference_index_b=0,
        number_of_eigenvectors=4,
        mu=1.0,
        statistics_buffer_length=96,
        hop_size=32,  # 75% overlap
        sampling_rate=8000,
        perceptual=False,
        key=jax.random.key(0),
    )
    assert model.config.hop == 32
    for _ in range(4):
        out_a, *_ = model.process_input_buffers(
            rng.standard_normal(32), rng.standard_normal(32)
        )
    assert out_a.shape == (4, 32, 3)
    assert np.isfinite(np.asarray(out_a)).all()


@pytest.mark.slow
def test_scale_scene_16_speakers(rng):
    """North-star scene geometry (16 loudspeakers, 48 kHz): float32
    production runs finite, contrast is positive, and the subspace solver
    matches the exact solver (the achievable contrast itself is a
    property of the synthetic scene — exact EIGH gives the same number)."""
    import dataclasses

    from apvast_tpu.config import GevdSolver
    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.utils.scenes import scale_scene

    scene = scale_scene(16)

    def contrast(cfg):
        plan = build_plan(cfg, scene.rir_a, scene.rir_b)
        state = init_state(cfg, key=jax.random.key(0))
        fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
        local = np.random.default_rng(1234)
        outs = []
        for _ in range(10):
            state, out = fn(
                state,
                jnp.asarray(local.standard_normal(cfg.hop), dtype=jnp.float32),
                jnp.asarray(local.standard_normal(cfg.hop), dtype=jnp.float32),
            )
            outs.append(np.asarray(out.out_a))
        feeds = np.concatenate([o[0] for o in outs[5:]], axis=0)
        return float(
            acoustic_contrast_db(
                predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_a)),
                predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_b)),
            )
        )

    approx = contrast(
        dataclasses.replace(scene.config, gevd_solver=GevdSolver.SUBSPACE)
    )
    exact = contrast(
        dataclasses.replace(scene.config, gevd_solver=GevdSolver.EIGH)
    )
    assert np.isfinite(approx) and approx > 0.5, f"contrast {approx:.2f} dB"
    assert abs(approx - exact) < 0.3, f"subspace {approx:.2f} vs eigh {exact:.2f}"


def test_config_validation_extras():
    from apvast_tpu.config import ApVastConfig

    kw = dict(rir_length=60, num_srcs=2, num_mics=2, block_size=128,
              filter_length=12, reference_index_a=0, reference_index_b=0,
              num_eigenvectors=3, mu=1.0, statistics_buffer_length=96,
              sampling_rate=8000)
    for bad in [dict(modeling_delay=12), dict(modeling_delay=-1),
                dict(modeling_delay=4, hop_size=200)]:  # hop > block
        try:
            ApVastConfig(**{**kw, **bad})
            raise AssertionError(f"expected rejection for {bad}")
        except ValueError:
            pass


@pytest.mark.slow
def test_long_run_stability(rng):
    """100 hops in float32 production mode (subspace + guards): outputs
    stay finite and steady-state contrast does not degrade."""
    import dataclasses

    from apvast_tpu.config import ApVastConfig, GevdSolver
    from apvast_tpu.engine import build_plan, init_state, run_stream

    rir_a = synthetic_rirs(120, 4, 3, seed=21)
    rir_b = synthetic_rirs(120, 4, 3, seed=22)
    cfg = ApVastConfig.for_rirs(
        rir_a, rir_b, block_size=256, filter_length=24, modeling_delay=6,
        reference_index_a=0, reference_index_b=0, num_eigenvectors=8,
        mu=1.0, statistics_buffer_length=256, sampling_rate=8000,
        perceptual=True, dtype="float32",
        gevd_solver=GevdSolver.SUBSPACE, reg_b_relative=1e-6,
    )
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    sig = rng.standard_normal(cfg.hop * 100).astype(np.float32)
    sig2 = rng.standard_normal(cfg.hop * 100).astype(np.float32)
    state, outs = run_stream(cfg, plan, state, jnp.asarray(sig), jnp.asarray(sig2))
    stacked = np.asarray(outs.out_a)  # (100, 8, hop, 4)
    assert np.isfinite(stacked).all()

    def contrast(sl):
        feeds = stacked[sl, 0].reshape(-1, 4)
        return float(
            acoustic_contrast_db(
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_a)),
                predict_pressure(jnp.asarray(feeds), jnp.asarray(rir_b)),
            )
        )

    early = contrast(slice(10, 40))
    late = contrast(slice(70, 100))
    assert late > early - 1.5, f"contrast degraded: {early:.1f} -> {late:.1f} dB"


@pytest.mark.slow
def test_scale_scene_32_speakers_float32_subspace():
    """Regression: the float32 PRODUCTION solver (subspace + invert
    whitening) at JL = 1600. Before the triangular_inverse large-block
    fix the blocked Neumann inversion overflowed to inf on every hop and
    the NaN guards silenced 100% of the outputs — the exact-solver test
    below never exercised this path. Full mic array and statistics
    buffer (the float32 conditioning case), lag statistics (the
    tractable CPU path at this scale)."""
    import dataclasses

    from apvast_tpu.config import GevdSolver
    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.utils.scenes import scale_scene

    scene = scale_scene(
        32,
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_oversample=14,
        subspace_iters=2,
        use_lag_statistics=True,
        use_matmul_dft=True,
    )
    cfg = scene.config
    assert cfg.jl == 1600 and cfg.dtype == "float32"
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    local = np.random.default_rng(5)
    outs = []
    for _ in range(5):
        state, out = fn(
            state,
            jnp.asarray(local.standard_normal(cfg.hop), jnp.float32),
            jnp.asarray(local.standard_normal(cfg.hop), jnp.float32),
        )
        assert int(out.silenced) == 0
        outs.append(np.asarray(out.out_a))
    feeds = np.concatenate([o[0] for o in outs[3:]], axis=0)
    assert np.isfinite(feeds).all() and np.abs(feeds).max() > 0
    contrast = float(
        acoustic_contrast_db(
            predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_a)),
            predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_b)),
        )
    )
    # CPU gate run (tools/r3_quality_cpu.py): rank-1 contrast matches the
    # exact solver to 1e-4 dB at this geometry (~14.4 dB after warmup);
    # a loose floor here keeps the 2-warmup-hop test robust.
    assert np.isfinite(contrast) and contrast > 5.0, contrast


@pytest.mark.slow
def test_scale_scene_32_speakers_jl1600():
    """BASELINE.json config 5 (32-loudspeaker TPU-scale sweep): the
    engine runs the JL = 1600 pencil end-to-end (exact solver, float32)
    with finite outputs and positive contrast, and the offline
    mu x rank design surface at JL = 1600 behaves (contrast decreasing
    in mu at fixed rank; all points finite)."""
    import dataclasses

    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.models import vast_offline_sweep
    from apvast_tpu.utils.scenes import scale_scene

    # Reduced mic count / statistics buffer keep the CPU test tractable;
    # geometry (32 srcs x J=50 -> JL=1600) is the config-5 pencil size.
    # float64: at 6 mics x 350 frames the 1600-dim covariance is barely
    # overdetermined and float32 Cholesky fails — the production-scale
    # run uses the full mic array and statistics buffer.
    scene = scale_scene(
        32, num_mics=6, statistics_buffer_length=400, dtype="float64"
    )
    cfg = scene.config
    assert cfg.jl == 1600
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))
    local = np.random.default_rng(5)
    outs = []
    for _ in range(4):
        state, out = fn(
            state,
            jnp.asarray(local.standard_normal(cfg.hop), jnp.float32),
            jnp.asarray(local.standard_normal(cfg.hop), jnp.float32),
        )
        assert int(out.silenced) == 0
        outs.append(np.asarray(out.out_a))
    feeds = np.concatenate([o[0] for o in outs[2:]], axis=0)
    contrast = float(
        acoustic_contrast_db(
            predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_a)),
            predict_pressure(jnp.asarray(feeds), jnp.asarray(scene.rir_b)),
        )
    )
    assert np.isfinite(contrast) and contrast > 0.5, contrast

    # Offline mu x rank surface at the same JL (vast.m:85-91 per point).
    mu_grid = jnp.asarray([0.1, 1.0, 10.0], jnp.float32)
    surface = vast_offline_sweep(
        jnp.asarray(scene.rir_a, jnp.float32),
        jnp.asarray(scene.rir_b, jnp.float32),
        filter_length=50,
        modeling_delay=24,
        reference_index=0,
        num_eigenvectors=8,
        mu_grid=mu_grid,
        num_steps=400,
        reg=1e-5,
    )
    assert surface.shape == (3, 8, 50, 32)
    assert bool(jnp.all(jnp.isfinite(surface)))

    def sweep_contrast(w):
        imp = np.zeros((400, 32), np.float32)
        imp[: w.shape[0]] = np.asarray(w)
        pa = predict_pressure(jnp.asarray(imp), jnp.asarray(scene.rir_a))
        pb = predict_pressure(jnp.asarray(imp), jnp.asarray(scene.rir_b))
        return float(acoustic_contrast_db(pa, pb))

    # Rank-1 (ACC-like) designs: contrast should not increase with mu.
    c = [sweep_contrast(surface[i, 0]) for i in range(3)]
    assert c[0] >= c[1] >= c[2] - 0.5, c
    # Higher rank trades contrast for target fidelity at fixed mu.
    c_lo = sweep_contrast(surface[1, 0])
    c_hi = sweep_contrast(surface[1, -1])
    assert c_lo >= c_hi - 1e-6, (c_lo, c_hi)


def test_stat_carry_non_deleted_branch():
    """hop <= filter_length disables the deleted-form statistics carry
    (engine/hop.py stage 4): the raw-buffer fallback must dispatch, keep
    consistent state shapes, and agree across statistics branches."""
    import dataclasses

    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.utils.rir import synthetic_rirs

    rir_a = synthetic_rirs(60, 2, 2, seed=3)
    rir_b = synthetic_rirs(60, 2, 2, seed=4)
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=64,
        filter_length=32,  # == hop: carried_del is False
        modeling_delay=3,
        reference_index_a=0,
        reference_index_b=1,
        num_eigenvectors=4,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=False,
    )
    assert cfg.hop == cfg.filter_length
    outs = {}
    for name, over in (
        ("einsum", {}),
        ("lag", dict(use_lag_statistics=True, lag_assembly="pair")),
    ):
        c = dataclasses.replace(cfg, **over)
        plan = build_plan(c, rir_a, rir_b)
        state = init_state(c, key=jax.random.key(0))
        assert state.wresp_stat.shape[-1] == 96  # raw form
        rng_l = np.random.default_rng(5)
        for _ in range(3):
            state, out = process_hop(
                c,
                plan,
                state,
                jnp.asarray(rng_l.standard_normal(c.hop)),
                jnp.asarray(rng_l.standard_normal(c.hop)),
            )
        outs[name] = np.asarray(out.out_a)
    scale = np.abs(outs["einsum"]).max()
    np.testing.assert_allclose(
        outs["lag"], outs["einsum"], rtol=1e-9, atol=1e-9 * scale
    )


def test_stat_carry_large_hop_fallback():
    """hop > filter_length but hop + filter_length > stat_len: the
    deleted-form carry's slice sources would clamp (its first J samples
    extend into the fresh emit), so config.carried_deleted_statistics
    must be False and the general slide-then-delete path must run —
    previously this config sized a wrong-length buffer that crashed
    lax.scan (code-review r3)."""
    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.engine import build_plan, init_state, process_hop, run_stream

    rir_a = synthetic_rirs(60, 2, 2, seed=3)
    rir_b = synthetic_rirs(60, 2, 2, seed=4)
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=128,
        filter_length=32,
        hop_size=80,  # hop > J, hop + J = 112 > stat_len = 96
        modeling_delay=3,
        reference_index_a=0,
        reference_index_b=1,
        num_eigenvectors=4,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=False,
    )
    assert cfg.hop > cfg.filter_length
    assert not cfg.carried_deleted_statistics
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    assert state.wresp_stat.shape[-1] == 96  # raw form
    rng_l = np.random.default_rng(5)
    sig_a = rng_l.standard_normal(cfg.hop * 3)
    sig_b = rng_l.standard_normal(cfg.hop * 3)
    # The scan (carry-structure strict) must run...
    _, outs = run_stream(
        cfg, plan, state, jnp.asarray(sig_a), jnp.asarray(sig_b)
    )
    assert np.isfinite(np.asarray(outs.out_a)).all()
    # ...and match the hop-by-hop drive (scan and eager trace fuse
    # differently; agreement is to float64 roundoff, not bitwise).
    st = state
    for h in range(3):
        st, out = process_hop(
            cfg,
            plan,
            st,
            jnp.asarray(sig_a[h * cfg.hop : (h + 1) * cfg.hop]),
            jnp.asarray(sig_b[h * cfg.hop : (h + 1) * cfg.hop]),
        )
    scale = np.abs(np.asarray(outs.out_a[-1])).max()
    np.testing.assert_allclose(
        np.asarray(out.out_a),
        np.asarray(outs.out_a[-1]),
        rtol=1e-9,
        atol=1e-9 * scale,
    )
    # Boundary: hop + J == stat_len keeps the deleted-form carry.
    cfg_edge = dataclasses.replace(cfg, hop_size=64)
    assert cfg_edge.carried_deleted_statistics
    st_edge = __import__("apvast_tpu.engine", fromlist=["init_state"]).init_state(
        cfg_edge, key=jax.random.key(0)
    )
    assert st_edge.wresp_stat.shape[-1] == 95  # deleted form


def test_hop_exceeding_statistics_buffer_keeps_window_length():
    """hop > statistics_buffer_length is a valid configuration (the
    statistics window sees only the most recent stat_len samples of
    each hop) — slide() must PRESERVE the configured window length
    instead of silently growing the carried buffer to hop length
    (which broke lax.scan's carry contract; code-review r3)."""
    from apvast_tpu.config import ApVastConfig
    from apvast_tpu.engine import build_plan, init_state, process_hop, run_stream

    rir_a = synthetic_rirs(60, 2, 2, seed=3)
    rir_b = synthetic_rirs(60, 2, 2, seed=4)
    cfg = ApVastConfig.for_rirs(
        rir_a,
        rir_b,
        block_size=256,  # default hop 128 > stat 96
        filter_length=32,
        modeling_delay=3,
        reference_index_a=0,
        reference_index_b=1,
        num_eigenvectors=4,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=False,
    )
    assert cfg.hop == 128 and not cfg.carried_deleted_statistics
    plan = build_plan(cfg, rir_a, rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    rng_l = np.random.default_rng(5)
    st, out = process_hop(
        cfg,
        plan,
        state,
        jnp.asarray(rng_l.standard_normal(cfg.hop)),
        jnp.asarray(rng_l.standard_normal(cfg.hop)),
    )
    assert st.wresp_stat.shape == state.wresp_stat.shape  # window kept
    assert st.wtarget_stat.shape == state.wtarget_stat.shape
    # The scan path (strict carry structure) must also run.
    _, outs = run_stream(
        cfg,
        plan,
        state,
        jnp.asarray(rng_l.standard_normal(cfg.hop * 2)),
        jnp.asarray(rng_l.standard_normal(cfg.hop * 2)),
    )
    assert np.isfinite(np.asarray(outs.out_a)).all()
