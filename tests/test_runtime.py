"""Native real-time runtime: ring buffer semantics (incl. wraparound and
threaded SPSC use), hop framing, and the stream host end-to-end."""

import threading

import jax
import numpy as np
import pytest

from apvast_tpu.models.apvast import ApVast
from apvast_tpu.runtime.native import HopFramer, RingBuffer, load_native
from apvast_tpu.runtime.stream_host import StreamHost
from apvast_tpu.utils.rir import synthetic_rirs


@pytest.fixture(scope="module", autouse=True)
def _native():
    load_native()  # builds libapvast_rt.so once


def test_ring_roundtrip(rng):
    ring = RingBuffer(64)
    assert ring.capacity == 64
    data = rng.standard_normal(40).astype(np.float32)
    assert ring.write(data) == 40
    out = ring.read(40)
    np.testing.assert_array_equal(out, data)
    ring.close()


def test_ring_wraparound(rng):
    ring = RingBuffer(32)
    for _ in range(20):  # push/pull past the capacity many times
        chunk = rng.standard_normal(13).astype(np.float32)
        assert ring.write(chunk) == 13
        np.testing.assert_array_equal(ring.read(13), chunk)
    assert ring.overruns == 0 and ring.underruns == 0
    ring.close()


def test_ring_overrun_underrun_accounting():
    ring = RingBuffer(16)
    assert ring.write(np.zeros(20, dtype=np.float32)) == 16
    assert ring.overruns == 1
    assert len(ring.read(20)) == 16
    assert ring.underruns == 1
    ring.close()


def test_ring_threaded_spsc(rng):
    """Producer and consumer on different threads move data intact."""
    ring = RingBuffer(1 << 12)
    total = 50_000
    src = rng.standard_normal(total).astype(np.float32)
    received = []

    def producer():
        pos = 0
        while pos < total:
            pos += ring.write(src[pos : pos + 512])

    def consumer():
        got = 0
        while got < total:
            chunk = ring.read(min(384, total - got))
            got += len(chunk)
            if len(chunk):
                received.append(chunk)

    threads = [threading.Thread(target=producer), threading.Thread(target=consumer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    np.testing.assert_array_equal(np.concatenate(received), src)
    ring.close()


def test_framer(rng):
    framer = HopFramer(hop=128, max_backlog_hops=4)
    sig = rng.standard_normal(500).astype(np.float32)
    # Push in awkward chunk sizes.
    for start in range(0, 500, 37):
        framer.push(sig[start : start + 37])
    assert framer.ready == 3  # 500 // 128
    hops = [framer.pop() for _ in range(3)]
    np.testing.assert_array_equal(np.concatenate(hops), sig[: 3 * 128])
    assert framer.pop() is None
    framer.close()


def test_stream_host_end_to_end(rng):
    rir_a = synthetic_rirs(60, 3, 2, seed=41)
    rir_b = synthetic_rirs(60, 3, 2, seed=42)
    model = ApVast(
        block_size=128,
        rir_a=rir_a,
        rir_b=rir_b,
        filter_length=12,
        modeling_delay=4,
        reference_index_a=0,
        reference_index_b=0,
        number_of_eigenvectors=3,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=False,
        key=jax.random.key(0),
        dtype="float32",
    )
    host = StreamHost(model, span_index=-1)
    hop = model.config.hop
    # Feed 5 hops of audio in sound-card-sized chunks (256 frames).
    sig_a = rng.standard_normal(hop * 5).astype(np.float32)
    sig_b = rng.standard_normal(hop * 5).astype(np.float32)
    for start in range(0, len(sig_a), 256):
        host.push_input(sig_a[start : start + 256], sig_b[start : start + 256])
    processed = host.process_pending()
    assert processed == 5
    assert host.hops_processed == 5
    out = host.pull_output("a", 0, hop * 5)
    assert out.shape == (hop * 5,)
    assert np.isfinite(out).all()
    assert host.dropped_input_hops == 0


def test_stream_host_background_thread(rng):
    rir_a = synthetic_rirs(60, 3, 2, seed=43)
    rir_b = synthetic_rirs(60, 3, 2, seed=44)
    model = ApVast(
        block_size=128,
        rir_a=rir_a,
        rir_b=rir_b,
        filter_length=12,
        modeling_delay=4,
        reference_index_a=0,
        reference_index_b=0,
        number_of_eigenvectors=3,
        mu=1.0,
        statistics_buffer_length=96,
        sampling_rate=8000,
        perceptual=False,
        key=jax.random.key(0),
        dtype="float32",
    )
    host = StreamHost(model)
    host.start()
    hop = model.config.hop
    import time

    for _ in range(4):
        host.push_input(
            rng.standard_normal(hop).astype(np.float32),
            rng.standard_normal(hop).astype(np.float32),
        )
    deadline = time.time() + 20
    while host.hops_processed < 4 and time.time() < deadline:
        time.sleep(0.01)
    host.stop()
    assert host.hops_processed == 4


def test_stream_host_single_zone(rng):
    """run_b=False models must stream without crashing (zone B silent)."""
    rir_a = synthetic_rirs(60, 3, 2, seed=45)
    rir_b = synthetic_rirs(60, 3, 2, seed=46)
    model = ApVast(
        block_size=128, rir_a=rir_a, rir_b=rir_b, filter_length=12,
        modeling_delay=4, reference_index_a=0, reference_index_b=0,
        number_of_eigenvectors=3, mu=1.0, statistics_buffer_length=96,
        sampling_rate=8000, perceptual=False, run_b=False,
        key=jax.random.key(0), dtype="float32",
    )
    host = StreamHost(model)
    hop = model.config.hop
    for _ in range(3):
        assert host.push_input(
            rng.standard_normal(hop).astype(np.float32),
            rng.standard_normal(hop).astype(np.float32),
        )
    assert host.process_pending() == 3
    out = host.pull_output("a", 0, hop * 3)
    assert np.isfinite(out).all()


def test_push_input_atomic_drop(rng):
    """A chunk pair that does not fit in BOTH rings is dropped whole —
    the zones never desynchronize."""
    rir_a = synthetic_rirs(60, 2, 2, seed=47)
    model = ApVast(
        block_size=128, rir_a=rir_a, rir_b=rir_a, filter_length=12,
        modeling_delay=4, reference_index_a=0, reference_index_b=0,
        number_of_eigenvectors=2, mu=1.0, statistics_buffer_length=96,
        sampling_rate=8000, perceptual=False, key=jax.random.key(0),
        dtype="float32",
    )
    host = StreamHost(model, backlog_hops=1)
    hop = model.config.hop
    chunk = rng.standard_normal(hop).astype(np.float32)
    accepted = 0
    for _ in range(10):  # overflow the small backlog
        accepted += int(host.push_input(chunk, chunk))
    assert host.dropped_input_chunks > 0
    # Alignment invariant: both framers hold identical sample counts.
    assert host.input_a.ready == host.input_b.ready


def test_pull_output_zone_validation():
    """pull_output must reject unknown zone strings instead of silently
    routing them to zone B's rings (code-review r3)."""
    rir_a = synthetic_rirs(60, 3, 2, seed=41)
    rir_b = synthetic_rirs(60, 3, 2, seed=42)
    model = ApVast(
        block_size=128, rir_a=rir_a, rir_b=rir_b, filter_length=12,
        modeling_delay=4, reference_index_a=0, reference_index_b=0,
        number_of_eigenvectors=3, mu=1.0, statistics_buffer_length=96,
        sampling_rate=8000, perceptual=False, key=jax.random.key(0),
        dtype="float32",
    )
    host = StreamHost(model, span_index=-1)
    for bad in ("A", "zone_a", ""):
        with pytest.raises(ValueError, match="zone"):
            host.pull_output(bad, 0, 4)


def test_stream_host_batched_drain_matches_per_hop(rng):
    """StreamHost(batch_hops=N): the one-dispatch backlog drain
    (model.process_hops_span) must produce EXACTLY the per-hop loop's
    output rings — the serving mode an RPC-attached accelerator needs
    (the dispatch round trip, ~26 ms on the axon tunnel, dominates the
    16.7 ms hop budget; batching N hops amortizes it N-fold at N hops
    of added latency)."""
    rir_a = synthetic_rirs(60, 3, 2, seed=41)
    rir_b = synthetic_rirs(60, 3, 2, seed=42)

    def build():
        return ApVast(
            block_size=128, rir_a=rir_a, rir_b=rir_b, filter_length=12,
            modeling_delay=4, reference_index_a=0, reference_index_b=0,
            number_of_eigenvectors=3, mu=1.0, statistics_buffer_length=96,
            sampling_rate=8000, perceptual=False, key=jax.random.key(0),
            dtype="float32",
        )

    hop = build().config.hop
    sig_a = rng.standard_normal(hop * 6).astype(np.float32)
    sig_b = rng.standard_normal(hop * 6).astype(np.float32)
    outs = {}
    for batch in (1, 4):
        host = StreamHost(
            build(), span_index=-1, backlog_hops=8, batch_hops=batch
        )
        host.push_input(sig_a, sig_b)
        assert host.process_pending() == 6
        outs[batch] = np.stack(
            [host.pull_output("a", s, hop * 6) for s in range(2)]
        )
    np.testing.assert_array_equal(outs[4], outs[1])

    import pytest

    class NoWindow:
        config = build().config

    with pytest.raises(ValueError, match="process_hops_span"):
        StreamHost(NoWindow(), batch_hops=4)
