"""N3: mesh/sharding layer on the 8-device virtual CPU mesh — the
multi-scene batched hop under (scene x mic) shard_map (psum-combined
statistics) must match the unsharded computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan, init_state
from apvast_tpu.parallel.mesh import (
    make_mesh,
    shard_plan,
    shard_scene_batch,
    sharded_multi_scene_hop,
)
from apvast_tpu.utils.rir import synthetic_rirs


def _scene_config():
    # 8 mics so the mic axis splits over 4 devices.
    return ApVastConfig(
        rir_length=64,
        num_srcs=4,
        num_mics=8,
        block_size=64,
        filter_length=8,
        modeling_delay=3,
        reference_index_a=0,
        reference_index_b=1,
        num_eigenvectors=4,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=True,
    )


def _stack(trees):
    return jax.tree.map(lambda *x: jnp.stack(x), *trees)


@pytest.fixture(scope="module")
def scene_batch():
    cfg = _scene_config()
    plans, states = [], []
    for i in range(2):
        rir_a = synthetic_rirs(64, 4, 8, seed=30 + i)
        rir_b = synthetic_rirs(64, 4, 8, seed=40 + i)
        plans.append(build_plan(cfg, rir_a, rir_b))
        states.append(init_state(cfg, key=jax.random.key(i)))
    rng = np.random.default_rng(5)
    hops = jnp.asarray(rng.standard_normal((2, 2, cfg.hop)))  # (scene, ab, hop)
    return cfg, _stack(plans), _stack(states), hops


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mic_sharded_matches_unsharded(scene_batch):
    cfg, plans, states, hops = scene_batch
    # Unsharded reference run (plain jit(vmap)).
    ref_fn = sharded_multi_scene_hop(cfg)
    ref_state, ref_out = ref_fn(plans, states, hops[:, 0], hops[:, 1])

    mesh = make_mesh({"scene": 2, "mic": 4})
    sharded_fn = sharded_multi_scene_hop(cfg, mesh)
    sh_plans = shard_plan(plans, mesh)
    sh_states = shard_scene_batch(states, mesh)
    got_state, got_out = sharded_fn(sh_plans, sh_states, hops[:, 0], hops[:, 1])

    np.testing.assert_allclose(
        np.asarray(got_out.out_a), np.asarray(ref_out.out_a), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(got_state.wresp_stat),
        np.asarray(ref_state.wresp_stat),
        rtol=1e-9,
        atol=1e-11,
    )


def test_mic_sharding_survives_multiple_hops(scene_batch):
    cfg, plans, states, hops = scene_batch
    mesh = make_mesh({"scene": 2, "mic": 4})
    sharded_fn = sharded_multi_scene_hop(cfg, mesh)
    sh_plans = shard_plan(plans, mesh)
    state = shard_scene_batch(states, mesh)
    for _ in range(3):
        state, out = sharded_fn(sh_plans, state, hops[:, 0], hops[:, 1])
    assert np.all(np.isfinite(np.asarray(out.out_a)))


def test_scene_only_mesh(scene_batch):
    """Pure data-parallel layout (scene axis over devices) through GSPMD."""
    cfg, plans, states, hops = scene_batch
    mesh = make_mesh({"scene": 2})
    sh_plans = shard_plan(plans, mesh)
    sh_states = shard_scene_batch(states, mesh)
    hop_fn = sharded_multi_scene_hop(cfg)  # GSPMD path
    _, out = hop_fn(sh_plans, sh_states, hops[:, 0], hops[:, 1])
    assert out.out_a.shape == (2, cfg.num_eigenvectors, cfg.hop, cfg.num_srcs)


def test_mic_only_mesh(scene_batch):
    """Single scene, all 8 devices on the microphone axis."""
    cfg0 = _scene_config()
    rir_a = synthetic_rirs(64, 4, 8, seed=90)
    rir_b = synthetic_rirs(64, 4, 8, seed=91)
    plan = build_plan(cfg0, rir_a, rir_b)
    state = init_state(cfg0, key=jax.random.key(9))
    plans = jax.tree.map(lambda x: None if x is None else x[None], plan)
    states = jax.tree.map(lambda x: x[None], state)
    rng = np.random.default_rng(17)
    hops = jnp.asarray(rng.standard_normal((1, 2, cfg0.hop)))

    ref_fn = sharded_multi_scene_hop(cfg0)
    _, ref_out = ref_fn(plans, states, hops[:, 0], hops[:, 1])

    mesh = make_mesh({"mic": 8})
    sharded_fn = sharded_multi_scene_hop(cfg0, mesh)
    sh_plans = shard_plan(plans, mesh)
    sh_states = shard_scene_batch(states, mesh)
    _, got_out = sharded_fn(sh_plans, sh_states, hops[:, 0], hops[:, 1])
    np.testing.assert_allclose(
        np.asarray(got_out.out_a), np.asarray(ref_out.out_a), rtol=1e-9, atol=1e-11
    )


def test_multi_scene_wrapper(scene_batch):
    from apvast_tpu.models.multi_scene import MultiSceneApVast
    from apvast_tpu.utils.rir import synthetic_rirs

    cfg = _scene_config()
    pairs = [
        (synthetic_rirs(64, 4, 8, seed=70 + i), synthetic_rirs(64, 4, 8, seed=80 + i))
        for i in range(2)
    ]
    mesh = make_mesh({"scene": 2, "mic": 4})
    model = MultiSceneApVast(cfg, pairs, mesh=mesh)
    assert model.num_scenes == 2
    rng = np.random.default_rng(12)
    for _ in range(2):
        out = model.process_input_buffers(
            rng.standard_normal((2, cfg.hop)), rng.standard_normal((2, cfg.hop))
        )
    assert out.out_a.shape == (2, cfg.num_eigenvectors, cfg.hop, cfg.num_srcs)
    assert np.isfinite(np.asarray(out.out_a)).all()


@pytest.mark.slow
def test_mic_sharded_tpu_scale_jl1600():
    """BASELINE config 5 geometry (32 loudspeakers, JL=1600, 48 kHz,
    perceptual ON, production subspace solver) through the mic-sharded
    mesh: the claimed scaling path past the single-chip 32-speaker
    number, exercised at its own geometry (VERDICT r2 #3). 32 mics so
    the mic axis splits over all 8 devices."""
    from apvast_tpu.config import GevdSolver
    from apvast_tpu.utils.scenes import scale_scene

    scene = scale_scene(
        32,
        num_mics=32,
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_oversample=14,
        subspace_iters=2,
    )
    cfg = scene.config
    assert cfg.jl == 1600
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    state = init_state(cfg, key=jax.random.key(2))
    plans = jax.tree.map(lambda x: None if x is None else x[None], plan)
    states = jax.tree.map(lambda x: x[None], state)
    rng = np.random.default_rng(21)
    hops = jnp.asarray(
        rng.standard_normal((1, 2, cfg.hop)), dtype=jnp.float32
    )

    ref_fn = sharded_multi_scene_hop(cfg)
    ref_state, ref_out = ref_fn(plans, states, hops[:, 0], hops[:, 1])

    mesh = make_mesh({"mic": 8})
    sharded_fn = sharded_multi_scene_hop(cfg, mesh)
    sh_plans = shard_plan(plans, mesh)
    sh_states = shard_scene_batch(states, mesh)
    got_state, got_out = sharded_fn(sh_plans, sh_states, hops[:, 0], hops[:, 1])

    ref_stat = np.asarray(ref_state.wresp_stat)
    np.testing.assert_allclose(
        np.asarray(got_state.wresp_stat),
        ref_stat,
        rtol=1e-4,
        atol=1e-6 * float(np.abs(ref_stat).max()),
    )
    for got, want in (
        (got_out.out_a, ref_out.out_a),
        (got_out.out_b, ref_out.out_b),
    ):
        got, want = np.asarray(got), np.asarray(want)
        assert np.isfinite(got).all()
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=3e-2 * scale)


def test_fd_mic_sharded_matches_unsharded():
    """FD engine under (scene x mic) shard_map == unsharded."""
    from apvast_tpu.engine.fd_hop import init_fd_state
    from apvast_tpu.parallel.mesh import shard_fd_state, sharded_multi_scene_fd_hop

    cfg = _scene_config()
    plans, states = [], []
    for i in range(2):
        rir_a = synthetic_rirs(64, 4, 8, seed=130 + i)
        rir_b = synthetic_rirs(64, 4, 8, seed=140 + i)
        plans.append(build_plan(cfg, rir_a, rir_b))
        states.append(init_fd_state(cfg, key=jax.random.key(i)))
    plans, states = _stack(plans), _stack(states)
    rng = np.random.default_rng(15)
    hops = jnp.asarray(rng.standard_normal((2, 2, cfg.hop)))

    ref_fn = sharded_multi_scene_fd_hop(cfg)
    _, ref_out = ref_fn(plans, states, hops[:, 0], hops[:, 1])

    mesh = make_mesh({"scene": 2, "mic": 4})
    fn = sharded_multi_scene_fd_hop(cfg, mesh)
    sh_plans = shard_plan(plans, mesh)
    sh_states = shard_fd_state(states, mesh)
    got_state, got_out = fn(sh_plans, sh_states, hops[:, 0], hops[:, 1])
    np.testing.assert_allclose(
        np.asarray(got_out.out_a), np.asarray(ref_out.out_a), rtol=1e-8, atol=1e-10
    )


def test_run_multi_stream_matches_per_scene_tracking():
    """run_multi_stream (scan-of-vmap, shared rebuild cadence) must match
    per-scene run_stream exactly under the TRACKING whitening — the
    serving layout the round-3 multi-stream bench had to disable (the
    vmapped rebuild cond lowered to a per-hop select). All scenes start
    at hop 0, so the shared cadence IS each scene's own cadence."""
    import dataclasses

    from apvast_tpu.config import GevdSolver
    from apvast_tpu.engine import run_stream
    from apvast_tpu.engine.stream import run_multi_stream

    cfg = dataclasses.replace(
        _scene_config(),
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking",
        tracking_warmup_hops=2,
        tracking_rebuild_period=3,
    )
    plans, states, sigs = [], [], []
    rng = np.random.default_rng(21)
    n = cfg.hop * 7
    for i in range(2):
        rir_a = synthetic_rirs(64, 4, 8, seed=60 + i)
        rir_b = synthetic_rirs(64, 4, 8, seed=65 + i)
        plans.append(build_plan(cfg, rir_a, rir_b))
        states.append(init_state(cfg, key=jax.random.key(i)))
        sigs.append(rng.standard_normal((2, n)))
    sig_a = jnp.asarray(np.stack([s[0] for s in sigs]))
    sig_b = jnp.asarray(np.stack([s[1] for s in sigs]))

    st_batch, out_batch = run_multi_stream(
        cfg, _stack(plans), _stack(states), sig_a, sig_b
    )
    for i in range(2):
        st_i, out_i = run_stream(
            cfg, plans[i], states[i], sig_a[i], sig_b[i]
        )
        np.testing.assert_allclose(
            np.asarray(out_batch.out_a[:, i]), np.asarray(out_i.out_a),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(st_batch.gevd_minv[i]), np.asarray(st_i.gevd_minv),
            rtol=1e-10, atol=1e-12,
        )
    assert int(st_batch.gevd_hop[0]) == 7


def test_multi_scene_hop_tracking_scalar_rebuild():
    """The per-hop serving path (sharded_multi_scene_hop) under tracking:
    batched scenes advance identically to per-scene process_hop."""
    import dataclasses

    from apvast_tpu.config import GevdSolver
    from apvast_tpu.engine.hop import process_hop

    cfg = dataclasses.replace(
        _scene_config(),
        gevd_solver=GevdSolver.SUBSPACE,
        subspace_whiten="tracking",
        tracking_warmup_hops=1,
        tracking_rebuild_period=2,
    )
    plans, states = [], []
    for i in range(2):
        rir_a = synthetic_rirs(64, 4, 8, seed=60 + i)
        rir_b = synthetic_rirs(64, 4, 8, seed=65 + i)
        plans.append(build_plan(cfg, rir_a, rir_b))
        states.append(init_state(cfg, key=jax.random.key(i)))
    hop_fn = sharded_multi_scene_hop(cfg)
    rng = np.random.default_rng(3)
    sts = _stack(states)
    for _ in range(3):
        ha = jnp.asarray(rng.standard_normal((2, cfg.hop)))
        hb = jnp.asarray(rng.standard_normal((2, cfg.hop)))
        sts, out = hop_fn(_stack(plans), sts, ha, hb)
        refs = []
        for i in range(2):
            states[i], ref = process_hop(
                cfg, plans[i], states[i], ha[i], hb[i]
            )
            refs.append(ref)
        np.testing.assert_allclose(
            np.asarray(out.out_a), np.stack([np.asarray(r.out_a) for r in refs]),
            rtol=1e-10, atol=1e-12,
        )
