"""Stateful wrapper for the frequency-domain production engine."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan
from apvast_tpu.engine.fd_hop import init_fd_state, process_hop_fd
from apvast_tpu.engine.stream import stitch_outputs


class ApVastFD:
    """Frequency-domain AP-VAST (see engine/fd_hop.py).

    Same constructor surface as :class:`ApVast` except
    ``number_of_eigenvectors`` is the *per-bin* span rank (1 = per-bin
    BACC, num_srcs = per-bin pressure matching) and ``forgetting`` sets
    the covariance recursion decay.
    """

    def __init__(
        self,
        block_size: int,
        rir_a: np.ndarray,
        rir_b: np.ndarray,
        filter_length: int,
        modeling_delay: int,
        reference_index_a: int,
        reference_index_b: int,
        number_of_eigenvectors: int,
        mu: float,
        hop_size: int | None = None,
        sampling_rate: int = 48000,
        run_a: bool = True,
        run_b: bool = True,
        perceptual: bool = True,
        forgetting: float = 0.9,
        key: jax.Array | None = None,
        **config_overrides,
    ):
        self.config = ApVastConfig.for_rirs(
            rir_a,
            rir_b,
            block_size=block_size,
            filter_length=filter_length,
            modeling_delay=modeling_delay,
            reference_index_a=reference_index_a,
            reference_index_b=reference_index_b,
            num_eigenvectors=number_of_eigenvectors,
            mu=mu,
            # The FD engine has no time-domain statistics buffer; keep the
            # config field valid but unused.
            statistics_buffer_length=2 * filter_length + 1,
            hop_size=hop_size,
            sampling_rate=sampling_rate,
            run_a=run_a,
            run_b=run_b,
            perceptual=perceptual,
            **config_overrides,
        )
        rank_cap = self.config.num_srcs * self.config.fd_frame_taps
        if number_of_eigenvectors > rank_cap:
            raise ValueError(
                "FD span rank (number_of_eigenvectors) must be <= "
                f"num_srcs * fd_frame_taps = {rank_cap}"
            )
        self.forgetting = float(forgetting)
        self.plan = build_plan(self.config, rir_a, rir_b)
        self.state = init_fd_state(self.config, key=key)
        cfg = self.config
        fg = self.forgetting
        self._hop_fn = jax.jit(
            lambda plan, state, a, b: process_hop_fd(
                cfg, plan, state, a, b, forgetting=fg
            )
        )
        self._stream_fn = jax.jit(self._stream)

    def _stream(self, plan, state, sig_a, sig_b):
        cfg, fg = self.config, self.forgetting
        hop = cfg.hop
        num_hops = sig_a.shape[0] // hop
        hops_a = sig_a[: num_hops * hop].reshape(num_hops, hop)
        hops_b = sig_b[: num_hops * hop].reshape(num_hops, hop)

        def step(carry, xs):
            ha, hb = xs
            return process_hop_fd(cfg, plan, carry, ha, hb, forgetting=fg)

        return jax.lax.scan(step, state, (hops_a, hops_b))

    def process_input_buffers(self, input_a, input_b):
        hop = self.config.hop
        input_a = jnp.asarray(input_a).reshape(-1)
        input_b = jnp.asarray(input_b).reshape(-1)
        if input_a.shape[0] != hop or input_b.shape[0] != hop:
            raise ValueError(f"inputs must be exactly hop={hop} samples")
        self.state, outputs = self._hop_fn(self.plan, self.state, input_a, input_b)
        v = self.config.fd_num_solutions
        tile = lambda t: jnp.broadcast_to(t, (v, *t.shape))
        return (
            outputs.out_a,
            outputs.out_b,
            tile(outputs.out_a_t),
            tile(outputs.out_b_t),
        )

    def process_signals(self, signal_a, signal_b):
        signal_a = jnp.asarray(signal_a).reshape(-1)
        signal_b = jnp.asarray(signal_b).reshape(-1)
        n = (
            min(signal_a.shape[0], signal_b.shape[0]) // self.config.hop
        ) * self.config.hop
        self.state, outs = self._stream_fn(
            self.plan, self.state, signal_a[:n], signal_b[:n]
        )
        stitch = lambda x: None if x is None else stitch_outputs(x)
        v = self.config.fd_num_solutions

        def stitch_target(t):
            flat = t.reshape(-1, t.shape[-1])
            return jnp.broadcast_to(flat, (v, *flat.shape))

        return (
            stitch(outs.out_a),
            stitch(outs.out_b),
            stitch_target(outs.out_a_t),
            stitch_target(outs.out_b_t),
        )

    def reset(self, key: jax.Array | None = None) -> None:
        self.state = init_fd_state(self.config, key=key)
