"""N4: WOLA filterbank — perfect reconstruction and overlap-add semantics
(survey §4 property tests; window def Python/apvast.py:94)."""

import jax.numpy as jnp
import numpy as np

from apvast_tpu.ops.wola import (
    sine_window,
    slide,
    wola_analyze,
    wola_overlap_add,
    wola_synthesize,
)


def test_sine_window_cola():
    """sin^2 window pairs sum to one at 50% hop (perfect reconstruction
    precondition, Python/apvast.py:93-94)."""
    n = 64
    w = np.asarray(sine_window(n))
    assert np.allclose(w**2 + np.roll(w, n // 2) ** 2, 1.0)


def test_perfect_reconstruction(rng):
    """Analysis + unit weighting + synthesis reconstructs the input
    (after the one-block warmup) at 50% overlap."""
    block, hop = 64, 32
    win = sine_window(block)
    signal = rng.standard_normal(hop * 12)
    sliding = jnp.zeros(block)
    overlap = jnp.zeros(block)
    out = []
    for h in range(12):
        chunk = jnp.asarray(signal[h * hop : (h + 1) * hop])
        sliding = slide(sliding, chunk)
        spec = wola_analyze(win, sliding)
        new = wola_synthesize(win, spec, block)
        overlap, emitted = wola_overlap_add(overlap, new, hop)
        out.append(np.asarray(emitted))
    got = np.concatenate(out)
    # WOLA latency is exactly one hop: emitted sample h*hop + i equals
    # input sample (h-1)*hop + i once both window passes have summed.
    np.testing.assert_allclose(got[hop:], signal[: len(got) - hop], atol=1e-12)


def test_overlap_add_matches_reference_pattern(rng):
    """[old[hop:]; zeros] + new, emit first hop (Python/apvast.py:218,232)."""
    block, hop = 16, 8
    old = rng.standard_normal((3, block))
    new = rng.standard_normal((3, block))
    buf, emitted = wola_overlap_add(jnp.asarray(old), jnp.asarray(new), hop)
    want = np.concatenate([old[:, hop:], np.zeros((3, hop))], axis=1) + new
    np.testing.assert_allclose(np.asarray(buf), want)
    np.testing.assert_allclose(np.asarray(emitted), want[:, :hop])


def test_overlap_add_tail_matches_full_buffer():
    """Tail-form overlap-add emits bit-identical samples to the
    reference full-buffer update, at 50% and 75% overlap."""
    from apvast_tpu.ops.wola import wola_overlap_add_tail

    rng = np.random.default_rng(17)
    for block, hop in ((16, 8), (16, 4), (12, 6)):
        full = jnp.zeros((3, block))
        tail = jnp.zeros((3, block - hop))
        for _ in range(5):
            new = jnp.asarray(rng.standard_normal((3, block)))
            full, emit_full = wola_overlap_add(full, new, hop)
            tail, emit_tail = wola_overlap_add_tail(tail, new, hop)
            np.testing.assert_array_equal(
                np.asarray(emit_tail), np.asarray(emit_full)
            )
            np.testing.assert_array_equal(
                np.asarray(tail), np.asarray(full)[..., hop:]
            )
