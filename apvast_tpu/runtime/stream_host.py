"""Real-time stream host: sound-card callbacks <-> the AP-VAST engine.

Topology (all boundaries native lock-free rings, no locks or allocation
on the audio thread):

    audio in A --> HopFramer A \\
    audio in B --> HopFramer B --> engine thread (jitted process_hop)
                                    --> per-loudspeaker output rings
                                          --> audio out callbacks

The engine thread pops matched hop pairs, runs the compiled hop on the
accelerator and pushes the selected span's loudspeaker feeds; the audio
side only ever touches the native rings.
"""

from __future__ import annotations

import threading
import warnings

import numpy as np

from apvast_tpu.runtime.native import HopFramer, RingBuffer


class StreamHost:
    """Drive a stateful engine (ApVast / ApVastFD) from streaming input.

    Args:
        model: object with ``process_input_buffers(hop_a, hop_b)``
            returning (out_a, out_b, ...) shaped (spans, hop, srcs).
        span_index: which span solution feeds the outputs.
        backlog_hops: input buffering before drops are counted.
    """

    def __init__(
        self,
        model,
        span_index: int = -1,
        backlog_hops: int = 8,
        batch_hops: int = 1,
        pcm_feeds: bool = False,
    ):
        """``batch_hops > 1``: when at least that many hop pairs are
        queued, drain them in ONE device dispatch via the model's
        ``process_hops_span`` (bit-exact with the hop loop). On an
        RPC-attached accelerator the dispatch round trip dominates the
        hop budget (~26 ms through the axon tunnel vs ~1 ms device
        compute), so real-time serving NEEDS the batched drain; the
        price is up to ``batch_hops`` hops of added output latency.
        ``pcm_feeds=True`` fetches block-scaled int16 PCM feeds — half
        the bytes on a bandwidth-limited link, ~90 dB SNR."""
        self.model = model
        self.span_index = span_index
        self.batch_hops = int(batch_hops)
        self.pcm_feeds = bool(pcm_feeds)
        if self.batch_hops > 1 and not hasattr(model, "process_hops_span"):
            raise ValueError(
                "batch_hops > 1 requires a model with process_hops_span"
            )
        cfg = model.config
        self.hop = cfg.hop
        self.num_srcs = cfg.num_srcs
        self.input_a = HopFramer(self.hop, backlog_hops)
        self.input_b = HopFramer(self.hop, backlog_hops)
        # One output ring per (zone, loudspeaker).
        self.outputs_a = [
            RingBuffer(self.hop * (backlog_hops + 1)) for _ in range(self.num_srcs)
        ]
        self.outputs_b = [
            RingBuffer(self.hop * (backlog_hops + 1)) for _ in range(self.num_srcs)
        ]
        self.hops_processed = 0
        self.dropped_input_chunks = 0
        self.run_a = getattr(model.config, "run_a", True)
        self.run_b = getattr(model.config, "run_b", True)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- audio-side API (callback safe) ---------------------------------

    def push_input(self, chunk_a, chunk_b) -> bool:
        """Push one equal-length chunk pair; atomic across both zones.

        If either framer lacks space, the WHOLE pair is dropped (counted
        in ``dropped_input_chunks``) — partial drops would permanently
        time-skew the two programs against each other, which corrupts the
        filter design silently. Returns True if accepted.
        """
        n_a = np.asarray(chunk_a).size
        n_b = np.asarray(chunk_b).size
        if n_a != n_b:
            raise ValueError("zone chunks must have equal length")
        if self.input_a.writable < n_a or self.input_b.writable < n_b:
            self.dropped_input_chunks += 1
            return False
        self.input_a.push(chunk_a)
        self.input_b.push(chunk_b)
        return True

    def pull_output(self, zone: str, src: int, n: int) -> np.ndarray:
        if zone == "a":
            rings = self.outputs_a
        elif zone == "b":
            rings = self.outputs_b
        else:
            # A typo ('A', 'zone_a', ...) must not silently play the
            # OTHER zone's program into this zone's loudspeaker.
            raise ValueError(f"zone must be 'a' or 'b', got {zone!r}")
        return rings[src].read(n)

    # -- engine side -----------------------------------------------------

    def _flush_outputs(self, out_a, out_b) -> None:
        # np.asarray here is the only device sync: it waits for THIS
        # hop's compute, which has been running since its (async)
        # dispatch. Disabled zones yield None (the reference's run flags).
        if self.run_a and out_a is not None:
            feeds_a = np.asarray(out_a[self.span_index])  # (hop, srcs)
            for s in range(self.num_srcs):
                self.outputs_a[s].write(feeds_a[:, s])
        if self.run_b and out_b is not None:
            feeds_b = np.asarray(out_b[self.span_index])
            for s in range(self.num_srcs):
                self.outputs_b[s].write(feeds_b[:, s])
        self.hops_processed += 1

    def process_pending(self, max_hops: int | None = None) -> int:
        """Run the engine for every complete input hop pair available;
        returns the number of hops processed.

        One hop is kept IN FLIGHT within the call: hop k is dispatched
        (async) before hop k-1's outputs are fetched to the rings, so the
        host-side ring work and input staging of hop k overlap hop k-1's
        device compute. All outputs are flushed before returning — no
        cross-call latency is introduced."""
        done = 0
        pending = None
        while max_hops is None or done < max_hops:
            ready = min(self.input_a.ready, self.input_b.ready)
            if ready == 0:
                break
            cap = ready if max_hops is None else min(ready, max_hops - done)
            if self.batch_hops > 1 and cap >= 2:
                # Batched drain: n hops, ONE dispatch, span selected
                # inside the jit, one small fetch per zone.
                n = min(cap, self.batch_hops)
                wa = np.concatenate([self.input_a.pop() for _ in range(n)])
                wb = np.concatenate([self.input_b.pop() for _ in range(n)])
                if pending is not None:
                    self._flush_outputs(*pending)
                    pending = None
                fa, fb = self.model.process_hops_span(
                    wa, wb, span_index=self.span_index, pcm=self.pcm_feeds
                )
                if self.run_a and fa is not None:
                    fa = np.asarray(fa)
                    for s in range(self.num_srcs):
                        self.outputs_a[s].write(fa[:, s])
                if self.run_b and fb is not None:
                    fb = np.asarray(fb)
                    for s in range(self.num_srcs):
                        self.outputs_b[s].write(fb[:, s])
                self.hops_processed += n
                done += n
                continue
            hop_a = self.input_a.pop()
            hop_b = self.input_b.pop()
            out_a, out_b, *_ = self.model.process_input_buffers(hop_a, hop_b)
            if pending is not None:
                self._flush_outputs(*pending)
            pending = (out_a, out_b)
            done += 1
        if pending is not None:
            self._flush_outputs(*pending)
        return done

    def start(self, poll_seconds: float = 0.001) -> None:
        """Run the engine loop on a background thread.

        With ``batch_hops > 1`` the thread waits for a FULL batch before
        draining (one dispatch per batch_hops hops); anything shorter
        only drains at :meth:`stop`. Per-hop mode drains immediately."""

        def loop():
            while not self._stop.is_set():
                ready = min(self.input_a.ready, self.input_b.ready)
                if self.batch_hops > 1 and ready < self.batch_hops:
                    self._stop.wait(poll_seconds)
                    continue
                if self.process_pending(max_hops=max(1, self.batch_hops)) == 0:
                    self._stop.wait(poll_seconds)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        drained = True
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            if self._thread.is_alive():
                # ADVICE r4: the worker is still inside a long batched
                # dispatch — draining from this thread too would run
                # process_pending concurrently against the same model
                # state and output rings. Leave the remainder to the
                # worker and surface the timeout instead.
                drained = False
                warnings.warn(
                    "StreamHost.stop(): worker thread did not exit within "
                    "5 s (long batched dispatch in flight); skipping the "
                    "caller-side remainder drain",
                    RuntimeWarning,
                    stacklevel=2,
                )
            self._thread = None
        # Drain any sub-batch remainder the batched thread was holding.
        if drained:
            self.process_pending()

    @property
    def dropped_input_hops(self) -> int:
        """Native-framer short-write drops. Structurally 0 under
        ``push_input`` (its atomic writable pre-check rejects whole
        chunk pairs first — see ``dropped_input_chunks`` for that
        count); nonzero only if a caller bypasses the host and pushes
        the framers directly."""
        return self.input_a.dropped + self.input_b.dropped
