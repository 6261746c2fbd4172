"""Convenience stateful wrapper with the reference's calling convention.

Users of the reference drive ``apvast(...)`` then call
``process_input_buffers(hop_a, hop_b)`` per hop
(Python/apvast.py:40-56,153-165). This class offers the same surface on
top of the pure functional engine: it owns the config/plan/state triple,
jit-compiles the hop transition once, and updates its internal state
pytree per call. For offline runs prefer ``process_signals`` which scans
all hops inside one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import (
    build_plan,
    init_state,
    process_hop,
    run_stream,
    stitch_outputs,
)


class ApVast:
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
        statistics_buffer_length: int,
        hop_size: int | None = None,
        sampling_rate: int = 48000,
        run_a: bool = True,
        run_b: bool = True,
        perceptual: bool = True,
        key: jax.Array | None = None,
        **config_overrides,
    ):
        """Parameter list mirrors the reference constructor
        (Python/apvast.py:40-56); extra keyword arguments flow into
        :class:`ApVastConfig` (dtype, behavioral variants, ...)."""
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
            statistics_buffer_length=statistics_buffer_length,
            hop_size=hop_size,
            sampling_rate=sampling_rate,
            run_a=run_a,
            run_b=run_b,
            perceptual=perceptual,
            **config_overrides,
        )
        self.plan = build_plan(self.config, rir_a, rir_b)
        self.state = init_state(self.config, key=key)
        cfg = self.config
        # NOT donated: measured on the axon tunnel, donating the carried
        # state changes single-hop dispatch by nothing (26.06 vs
        # 26.08 ms — the cost is the RPC round trip), and alternating
        # donating executables over the same state buffers triggers
        # TPU-backend InvalidArgument on output fetches (observed with
        # the hop fn + two window drains sharing self.state).
        self._window_jits: dict = {}  # (n_hops, span) -> serving drain
        self._hop_fn = jax.jit(
            lambda plan, state, a, b: process_hop(cfg, plan, state, a, b)
        )

    def process_input_buffers(self, input_a, input_b):
        """One hop. Returns (out_a, out_b, out_a_t, out_b_t), each
        (V, hop, srcs) or None for a disabled zone — the reference's
        per-rank output lists (apvast.py:153-165) stacked on axis 0."""
        hop = self.config.hop
        input_a = jnp.asarray(input_a).reshape(-1)
        input_b = jnp.asarray(input_b).reshape(-1)
        if input_a.shape[0] != hop or input_b.shape[0] != hop:
            raise ValueError(f"inputs must be exactly hop={hop} samples")
        self.state, outputs = self._hop_fn(self.plan, self.state, input_a, input_b)
        v = self.config.num_solutions
        tile = lambda t: jnp.broadcast_to(t, (v, *t.shape))
        return (
            outputs.out_a,
            outputs.out_b,
            tile(outputs.out_a_t),
            tile(outputs.out_b_t),
        )

    def process_signals(self, signal_a, signal_b):
        """Offline path: scan all whole hops of two program signals inside
        one jit. Returns stitched signals (V, T, srcs) per field (None for
        disabled zones)."""
        signal_a = jnp.asarray(signal_a).reshape(-1)
        signal_b = jnp.asarray(signal_b).reshape(-1)
        n = (min(signal_a.shape[0], signal_b.shape[0]) // self.config.hop) * self.config.hop
        self.state, outs = run_stream(
            self.config, self.plan, self.state, signal_a[:n], signal_b[:n]
        )
        stitch = lambda x: None if x is None else stitch_outputs(x)
        v = self.config.num_solutions

        def stitch_target(t):  # (hops, hop, s) -> (v, T, s) broadcast
            flat = t.reshape(-1, t.shape[-1])
            return jnp.broadcast_to(flat, (v, *flat.shape))

        return (
            stitch(outs.out_a),
            stitch(outs.out_b),
            stitch_target(outs.out_a_t),
            stitch_target(outs.out_b_t),
        )

    def process_hops_span(
        self,
        window_a,
        window_b,
        span_index: int = -1,
        pcm: bool = False,
    ):
        """Serving drain: n whole hops in ONE dispatch, returning only the
        selected span's stitched loudspeaker feeds.

        A live host on an RPC-attached accelerator pays per ROUND TRIP
        and per BYTE (~26 ms + ~16 MB/s through the axon tunnel, vs
        ~1 ms of device compute per north-star hop) — so the backlog
        drain must be one scanned dispatch with the span selection
        INSIDE the jit and only the (n * hop, srcs) feeds fetched. Used
        by ``runtime.stream_host.StreamHost(batch_hops > 1)``.

        ``pcm=True`` additionally quantizes the feeds to BLOCK-SCALED
        int16 on device (one shared scale per batch, ~90 dB SNR relative
        to the batch peak — standard PCM practice) and dequantizes on
        the host, halving the fetch bytes.

        Returns (feeds_a, feeds_b), each (n * hop, srcs) float32 or None
        for a disabled zone. With ``pcm=False`` bit-exact with n calls
        of ``process_input_buffers`` (scan == loop, tests/test_runtime.py).
        """
        window_a = np.asarray(window_a, dtype=self.config.dtype).reshape(-1)
        window_b = np.asarray(window_b, dtype=self.config.dtype).reshape(-1)
        hop = self.config.hop
        n = window_a.shape[0] // hop
        if n * hop != window_a.shape[0] or window_a.shape != window_b.shape:
            raise ValueError("windows must be equal whole-hop lengths")
        key = (n, span_index, pcm)
        fn = self._window_jits.get(key)
        cfg = self.config
        zones = int(cfg.run_a) + int(cfg.run_b)
        if fn is None:
            plan = self.plan

            # RPC discipline: every host<->device transfer on the tunnel
            # costs a ~26 ms round trip REGARDLESS of size, so the drain
            # is exactly one upload (the stacked windows) and one fetch
            # (both zones' feeds packed side by side; the PCM block
            # scale rides bitcast into the first packed row).
            def run(plan, state, w):
                state, outs = run_stream(cfg, plan, state, w[0], w[1])

                def feeds(x):  # (n, v, hop, s) -> (n*hop, s), one span
                    if x is None:
                        return None
                    sel = x[:, span_index]
                    return sel.reshape(-1, sel.shape[-1])

                parts = [
                    f
                    for f in (feeds(outs.out_a), feeds(outs.out_b))
                    if f is not None
                ]
                packed = jnp.concatenate(parts, axis=1)  # (n*hop, z*s)
                if not pcm:
                    return state, packed
                peak = jnp.max(jnp.abs(packed))
                scale = 32766.0 / jnp.maximum(
                    peak, jnp.finfo(jnp.float32).tiny
                )
                q = jnp.round(packed * scale).astype(jnp.int16)
                if q.shape[1] < 2:
                    # The scale row needs 2 int16 slots; a single-zone,
                    # single-source feed is only 1 column wide — pad it
                    # (the host-side unpack slices by num_srcs, so the
                    # extra zero column is ignored).
                    q = jnp.pad(q, ((0, 0), (0, 2 - q.shape[1])))
                srow = jax.lax.bitcast_convert_type(
                    jnp.float32(scale)[None], jnp.int16
                ).reshape(1, 2)
                srow = jnp.pad(srow, ((0, 0), (0, q.shape[1] - 2)))
                return state, jnp.concatenate([srow, q], axis=0)

            fn = jax.jit(run)  # no donation — see _hop_fn note
            self._window_jits[key] = fn
        w = jnp.asarray(np.stack([window_a, window_b]))
        self.state, packed = fn(self.plan, self.state, w)
        arr = np.asarray(packed)
        if pcm:
            scale = np.frombuffer(arr[0, :2].tobytes(), np.float32)[0]
            arr = arr[1:].astype(np.float32) * (1.0 / scale)
        s = cfg.num_srcs
        fa = arr[:, :s] if cfg.run_a else None
        fb = arr[:, s if cfg.run_a else 0 :][:, :s] if cfg.run_b else None
        return fa, fb

    def reset(self, key: jax.Array | None = None) -> None:
        self.state = init_state(self.config, key=key)
