"""Sharding layer: scale AP-VAST over a TPU mesh with XLA collectives.

The reference is single-threaded (survey §2: no distributed code of any
kind); on TPU the scaling axes of this workload are

* ``scene`` — independent scenes / hyperparameter grid points / program
  streams (embarrassingly parallel, BASELINE.json config 5), sharded as
  pure data parallelism, and
* ``mic``   — the microphone sum inside the statistics contraction
  ``R = sum_m Y_m Y_m^T``: each device convolves, weights and frames its
  own microphone block, then the partial (R, r) are combined with one
  ``psum`` over ICI (``process_hop(mic_axis=...)``). Everything after the
  psum (GEVD, synthesis, output WOLA) is replicated — it is tiny next to
  the statistics work.

The mic path uses ``jax.shard_map`` so the per-device program is exactly
the single-device engine on a mic block plus one explicit collective — no
reliance on the auto-partitioner for the FFT-heavy inner stages.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apvast_tpu.config import ApVastConfig, GevdSolver
from apvast_tpu.engine.hop import HopOutputs, process_hop
from apvast_tpu.engine.plan import ApVastPlan
from apvast_tpu.engine.state import ApVastState

# Position of the microphone axis in each (unbatched) pytree field; None
# means no mic axis (replicated over 'mic').
_STATE_MIC_DIM = {
    "conv_history": None,
    "resp": 1,
    "target_resp": 1,
    "wresp_overlap": 1,
    "wtarget_overlap": 1,
    "wresp_stat": 1,
    "wtarget_stat": 1,
    "input_blocks": None,
    "out_overlap": None,
    "target_out_overlap": None,
    "gevd_q": None,
    "gevd_minv": None,
    "gevd_lam": None,
    "gevd_hop": None,
    "gevd_resid": None,
}
_PLAN_MIC_DIM = {
    "window": None,
    "conv_kernels": None,
    "dft_cos": None,
    "dft_sin": None,
    "idft_cos": None,
    "idft_sin": None,
    "idft_cos_plain": None,
    "rir_spec": 1,
    "target_rir_spec": 1,
    "target_filter_spec": None,
    "cfmr_sq": None,
    "cs": None,
    "ca": None,
    "leff": None,
    "spectrum_scale": None,
}
# Frequency-domain engine state: the per-bin covariance recursion holds
# mic-summed (psum'd) statistics, so only the response buffers shard.
_FD_STATE_MIC_DIM = {
    "conv_history": None,
    "resp": 1,
    "target_resp": 1,
    "input_blocks": None,
    "out_overlap": None,
    "target_out_overlap": None,
    "cov": None,
    "cross": None,
    "spec_hist": 2,  # (B-1, 4, mics, srcs, bins)
    "in_spec_hist": None,
}


def make_mesh(
    shape: dict[str, int], devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a mesh, e.g. ``make_mesh({'scene': 2, 'mic': 4})``."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = list(shape.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {shape} needs {total} devices, have {len(devices)}")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, tuple(shape.keys()))


def _pspec(obj, mic_dims, mesh, scene_axis, mic_axis, batched):
    """PartitionSpec pytree matching a plan/state dataclass."""
    specs = {}
    for field in dataclasses.fields(obj):
        leaf = getattr(obj, field.name)
        if leaf is None:
            specs[field.name] = None
            continue
        spec = [None] * leaf.ndim
        offset = 1 if batched else 0  # data has a leading scene dim
        if batched and scene_axis in mesh.axis_names:
            spec[0] = scene_axis
        mic_dim = mic_dims[field.name]
        if mic_dim is not None and mic_axis in mesh.axis_names:
            spec[mic_dim + offset] = mic_axis
        specs[field.name] = P(*spec)
    return dataclasses.replace(obj, **specs)


def _place(obj, spec_tree, mesh):
    put = lambda x, s: (
        None if x is None else jax.device_put(x, NamedSharding(mesh, s))
    )
    return jax.tree.map(put, obj, spec_tree, is_leaf=lambda x: x is None)


def shard_plan(plan, mesh, scene_axis="scene", mic_axis="mic", batched=True):
    """Place a (possibly scene-batched) plan on the mesh."""
    return _place(
        plan, _pspec(plan, _PLAN_MIC_DIM, mesh, scene_axis, mic_axis, batched), mesh
    )


def shard_scene_batch(state, mesh, scene_axis="scene", mic_axis="mic", batched=True):
    """Place a (possibly scene-batched) state on the mesh: scene axis on
    the leading dim, microphone axis sharded where present."""
    return _place(
        state, _pspec(state, _STATE_MIC_DIM, mesh, scene_axis, mic_axis, batched), mesh
    )


def shard_fd_state(state, mesh, scene_axis="scene", mic_axis="mic", batched=True):
    """Place a (possibly scene-batched) frequency-domain engine state."""
    return _place(
        state,
        _pspec(state, _FD_STATE_MIC_DIM, mesh, scene_axis, mic_axis, batched),
        mesh,
    )


def sharded_multi_scene_fd_hop(
    config: ApVastConfig,
    mesh: Mesh | None = None,
    scene_axis: str = "scene",
    mic_axis: str = "mic",
    forgetting: float = 0.9,
):
    """Frequency-domain analog of :func:`sharded_multi_scene_hop`: the
    per-bin covariance update psums over the mic axis."""
    from apvast_tpu.engine.fd_hop import process_hop_fd

    use_mic = mesh is not None and mic_axis in mesh.axis_names
    axis = mic_axis if use_mic else None

    def single(plan, state, ha, hb):
        return process_hop_fd(
            config, plan, state, ha, hb, forgetting=forgetting, mic_axis=axis
        )

    batched_fn = jax.vmap(single)
    if mesh is None:
        return jax.jit(batched_fn)

    def wrapped(plans, states, hops_a, hops_b):
        scene_spec = P(scene_axis) if scene_axis in mesh.axis_names else P()
        in_specs = (
            _pspec(plans, _PLAN_MIC_DIM, mesh, scene_axis, mic_axis, True),
            _pspec(states, _FD_STATE_MIC_DIM, mesh, scene_axis, mic_axis, True),
            scene_spec,
            scene_spec,
        )
        out_hop_specs = HopOutputs(
            out_a=scene_spec if config.run_a else None,
            out_b=scene_spec if config.run_b else None,
            out_a_t=scene_spec,
            out_b_t=scene_spec,
            silenced=scene_spec,
        )
        fn = jax.shard_map(
            batched_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(in_specs[1], out_hop_specs),
        )
        return fn(plans, states, hops_a, hops_b)

    return jax.jit(wrapped)


def sharded_multi_scene_hop(
    config: ApVastConfig,
    mesh: Mesh | None = None,
    scene_axis: str = "scene",
    mic_axis: str = "mic",
):
    """A jitted hop transition vmapped over a leading scene axis.

    With ``mesh=None``: plain jit(vmap) — sharding (if any) follows the
    inputs via GSPMD; suitable for scene-only data parallelism.

    With a mesh: an explicit ``shard_map`` program — scenes split over
    ``scene_axis``, microphones over ``mic_axis`` (if present in the
    mesh), with one psum combining the per-device partial statistics.
    Inputs must be placed with :func:`shard_plan` / :func:`shard_scene_batch`.

    Stack per-scene plans/states with
    ``jax.tree.map(lambda *x: jnp.stack(x), *plans)``; hop batches are
    (scenes, hop).
    """
    use_mic = mesh is not None and mic_axis in mesh.axis_names
    axis = mic_axis if use_mic else None
    tracking = (
        config.gevd_solver is GevdSolver.SUBSPACE
        and config.subspace_whiten == "tracking"
    )

    def single(plan, state, ha, hb, rebuild):
        return process_hop(
            config, plan, state, ha, hb, mic_axis=axis,
            rebuild_override=rebuild,
        )

    # The rebuild predicate must stay an UNBATCHED scalar (in_axes=None):
    # lockstep scenes share the cadence, computed from scene 0's carried
    # counter. A per-scene (batched) predicate would lower the tracking
    # solver's rebuild cond to a select paying the (jl, jl) factorization
    # every hop for every stream.
    vmapped = jax.vmap(single, in_axes=(0, 0, 0, 0, None))

    def batched_fn(plans, states, hops_a, hops_b):
        rebuild = None
        if tracking:
            gevd_hop = states.gevd_hop[0]
            rebuild = jnp.logical_or(
                gevd_hop < config.tracking_warmup_hops,
                gevd_hop % config.tracking_rebuild_period == 0,
            )
            if config.tracking_residual_rebuild > 0 and (
                states.gevd_resid is not None
            ):
                # Residual fallback stays an UNBATCHED scalar: ANY stale
                # scene rebuilds all (lockstep — see the in_axes note).
                rebuild = jnp.logical_or(
                    rebuild,
                    jnp.max(states.gevd_resid)
                    > config.tracking_residual_rebuild,
                )
        return vmapped(plans, states, hops_a, hops_b, rebuild)

    if mesh is None:
        return jax.jit(batched_fn)

    # Build spec pytrees from dataclass field tables; dummy objects carry
    # only ndim info, so use dataclass metadata directly.
    def plan_specs(plan):
        return _pspec(plan, _PLAN_MIC_DIM, mesh, scene_axis, mic_axis, True)

    def state_specs(state):
        return _pspec(state, _STATE_MIC_DIM, mesh, scene_axis, mic_axis, True)

    def wrapped(plans, states, hops_a, hops_b):
        scene_spec = P(scene_axis) if scene_axis in mesh.axis_names else P()
        in_specs = (
            plan_specs(plans),
            state_specs(states),
            scene_spec,
            scene_spec,
        )
        out_state_specs = state_specs(states)
        out_hop_specs = HopOutputs(
            out_a=scene_spec if config.run_a else None,
            out_b=scene_spec if config.run_b else None,
            out_a_t=scene_spec,
            out_b_t=scene_spec,
            silenced=scene_spec,
        )
        fn = jax.shard_map(
            batched_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(out_state_specs, out_hop_specs),
        )
        return fn(plans, states, hops_a, hops_b)

    return jax.jit(wrapped)
