"""Offline stream driver: the reference's hop loop (Matlab/main.m:52-62)
as a single ``lax.scan`` over a compiled hop transition."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine.hop import HopOutputs, process_hop
from apvast_tpu.engine.plan import ApVastPlan
from apvast_tpu.engine.state import ApVastState


@functools.partial(jax.jit, static_argnums=0)
def run_stream(
    config: ApVastConfig,
    plan: ApVastPlan,
    state: ApVastState,
    signal_a: jax.Array,
    signal_b: jax.Array,
) -> tuple[ApVastState, HopOutputs]:
    """Process whole program signals hop by hop under one jit.

    ``signal_a`` / ``signal_b``: (num_hops * hop,) — trailing partial hops
    must be trimmed/padded by the caller (static shapes). Returns the final
    state and HopOutputs with a leading ``num_hops`` axis on every field.
    """
    hop = config.hop
    num_hops = signal_a.shape[0] // hop
    hops_a = signal_a[: num_hops * hop].reshape(num_hops, hop)
    hops_b = signal_b[: num_hops * hop].reshape(num_hops, hop)

    def step(carry: ApVastState, xs):
        ha, hb = xs
        return process_hop(config, plan, carry, ha, hb)

    return jax.lax.scan(step, state, (hops_a, hops_b))


@functools.partial(jax.jit, static_argnums=0)
def run_multi_stream(
    config: ApVastConfig,
    plans: ApVastPlan,
    states: ApVastState,
    signals_a: jax.Array,
    signals_b: jax.Array,
) -> tuple[ApVastState, HopOutputs]:
    """Batched serving streams: ``lax.scan`` over hops OUTSIDE, a
    vmapped hop transition inside (scan-of-vmap).

    ``plans``/``states``: per-scene pytrees stacked on a leading scene
    axis; ``signals_*``: (scenes, num_hops * hop). Returns the final
    stacked states and HopOutputs with leading (num_hops, scenes) axes.

    vmap(run_stream) — vmap-of-scan — batches the tracking whitening's
    rebuild predicate, so its ``lax.cond`` lowers to a select that pays
    the (jl, jl) factorization EVERY hop for EVERY stream. Here the
    cadence is computed once per scan step from the shared hop counter
    (all lockstep streams rebuild together) and passed to the hop as an
    unbatched scalar, so serving keeps the production tracking solver.
    """
    hop = config.hop
    scenes = signals_a.shape[0]
    num_hops = signals_a.shape[1] // hop
    hops_a = signals_a[:, : num_hops * hop].reshape(scenes, num_hops, hop)
    hops_b = signals_b[:, : num_hops * hop].reshape(scenes, num_hops, hop)
    hops_a = jnp.swapaxes(hops_a, 0, 1)  # (num_hops, scenes, hop)
    hops_b = jnp.swapaxes(hops_b, 0, 1)

    tracking = states.gevd_hop is not None
    # Lockstep streams share the rebuild cadence; scene 0's carried
    # counter stands for all (init_state starts every scene at 0).
    base = states.gevd_hop[0] if tracking else jnp.zeros((), jnp.int32)

    def step(carry: ApVastState, xs):
        ha, hb, i = xs
        rebuild = None
        if tracking:
            gevd_hop = base + i
            rebuild = jnp.logical_or(
                gevd_hop < config.tracking_warmup_hops,
                gevd_hop % config.tracking_rebuild_period == 0,
            )
            if config.tracking_residual_rebuild > 0 and (
                carry.gevd_resid is not None
            ):
                # Unbatched scalar: any stale scene rebuilds all
                # (lockstep cadence — see docstring).
                rebuild = jnp.logical_or(
                    rebuild,
                    jnp.max(carry.gevd_resid)
                    > config.tracking_residual_rebuild,
                )
        return jax.vmap(
            lambda p, st, a, b: process_hop(
                config, p, st, a, b, rebuild_override=rebuild
            )
        )(plans, carry, ha, hb)

    steps = jnp.arange(num_hops, dtype=jnp.int32)
    return jax.lax.scan(step, states, (hops_a, hops_b, steps))


@functools.partial(jax.jit, static_argnums=0)
def run_stream_with_metrics(
    config: ApVastConfig,
    plan: ApVastPlan,
    state: ApVastState,
    signal_a: jax.Array,
    signal_b: jax.Array,
    rir_a: jax.Array,
    rir_b: jax.Array,
):
    """Like :func:`run_stream` but also emits per-hop on-device quality
    metrics (contrast / NMSE / RMS per span) — the structured analog of
    the reference driver's ad-hoc per-hop prints (Matlab/main.m:52-62).

    Returns (final_state, outputs, metrics) where every metrics field has
    a leading num_hops axis.
    """
    from apvast_tpu.observability import hop_metrics

    hop = config.hop
    num_hops = signal_a.shape[0] // hop
    hops_a = signal_a[: num_hops * hop].reshape(num_hops, hop)
    hops_b = signal_b[: num_hops * hop].reshape(num_hops, hop)

    def step(carry: ApVastState, xs):
        ha, hb = xs
        carry, out = process_hop(config, plan, carry, ha, hb)
        return carry, (out, hop_metrics(out, rir_a, rir_b))

    state, (outs, metrics) = jax.lax.scan(step, state, (hops_a, hops_b))
    return state, outs, metrics


def stitch_outputs(stacked: jax.Array) -> jax.Array:
    """Concatenate scanned per-hop outputs into continuous signals.

    ``stacked``: (num_hops, v, hop, srcs) -> (v, num_hops * hop, srcs),
    matching the driver-side assembly at Matlab/main.m:58-61.
    """
    num_hops, v, hop, srcs = stacked.shape
    return stacked.transpose(1, 0, 2, 3).reshape(v, num_hops * hop, srcs)
