"""Faithful NumPy re-expression of the reference Python engine's semantics.

This oracle exists purely as test ground truth: it reproduces, with the
*same library primitives the reference uses* (scipy ``lfilter`` with
carried states, scipy ``toeplitz`` including its corner-override
off-by-one, scipy ``schur``), the exact numerical behavior of
``/root/reference/Python/apvast.py`` — quirks included:

* statistics Toeplitz skips buffer sample J (apvast.py:336-338),
* statistics are unnormalized (apvast.py:329-364),
* regularization is ``B + 1e-7 I`` inside jdiag (apvast.py:22-24),
* a single target playback filter built from zone A's reference index
  serves both zones (apvast.py:389-390,418,422),
* the response buffers are noise-initialized (apvast.py:122-129) — here
  the noise is injected explicitly so runs are reproducible.

The only deliberate deviation: the perceptual weighting uses this
framework's own van de Par model (apvast_tpu.perceptual) instead of the
unavailable ``libdetectability`` package the reference imports
(apvast.py:4,77-83); the wiring (gain of the windowed target frame,
optional unit-norm, apvast.py:313-327) is identical.

It is deliberately written loop-light but NOT in JAX — an independent
code path against which the TPU engine is compared at <= 1e-4 relative
error (BASELINE.json north star), and in float64 at ~1e-10 in practice.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.signal

from apvast_tpu.config import ApVastConfig, WeightingNorm
from apvast_tpu.perceptual.tables import PerceptualTables, build_perceptual_tables


def reference_jdiag(a: np.ndarray, b: np.ndarray, reg: float = 1e-7):
    """The reference jdiag (Python/apvast.py:20-36): Cholesky whitening of
    the regularized B, Schur of the whitened A, back-transform, sort
    descending. Returns (U, d_vector)."""
    n = b.shape[0]
    chol = np.linalg.cholesky(b + reg * np.eye(n))
    half = scipy.linalg.solve_triangular(chol, a, lower=True)
    white = scipy.linalg.solve_triangular(chol, half.T, lower=True).T
    t, q = scipy.linalg.schur(white)
    x = scipy.linalg.solve_triangular(chol.T, q, lower=False)
    order = np.flip(np.argsort(np.diag(t)))
    return x[:, order], np.diag(t)[order]


class ReferenceApVast:
    """Stateful oracle with the reference's Python-variant semantics.

    Buffers use the reference's (time, src, mic) layout so each update
    step can be read against the cited reference lines.
    """

    def __init__(
        self,
        config: ApVastConfig,
        rir_a: np.ndarray,
        rir_b: np.ndarray,
        response_noise: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        cfg = config
        if cfg.hop_size is not None and cfg.hop_size != cfg.block_size // 2:
            # The oracle, like the reference default, runs at 50% overlap.
            raise NotImplementedError("oracle supports hop = block/2 only")
        self.cfg = cfg
        self.rir_a = np.asarray(rir_a, dtype=np.float64)
        self.rir_b = np.asarray(rir_b, dtype=np.float64)
        k, s, m = self.rir_a.shape
        block, hop, n = cfg.block_size, cfg.hop, cfg.statistics_buffer_length

        self.window = np.sin(np.pi / block * np.arange(block))

        # Modeling-delayed reference-speaker target RIRs (apvast.py:101-112).
        def delayed(rir: np.ndarray, ref: int) -> np.ndarray:
            out = np.zeros((k, m))
            out[cfg.modeling_delay :, :] = rir[: k - cfg.modeling_delay, ref, :]
            return out

        self.target_rir = [
            delayed(self.rir_a, cfg.reference_index_a),
            delayed(self.rir_b, cfg.reference_index_b),
        ]

        # lfilter delay-line states (apvast.py:114-120), path-major.
        self.path_state = np.zeros((4, k - 1, s, m))
        self.target_state = np.zeros((2, k - 1, m))

        # Response buffers, noise-initialized (apvast.py:122-129).
        if response_noise is None:
            rng = np.random.default_rng(0)
            resp = cfg.noise_init_scale * rng.standard_normal((4, block, s, m))
            tresp = cfg.noise_init_scale * rng.standard_normal((2, block, m))
        else:
            resp, tresp = (np.array(response_noise[0]), np.array(response_noise[1]))
        self.resp = resp
        self.target_resp = tresp

        self.wresp_overlap = np.zeros((4, block, s, m))
        self.wtarget_overlap = np.zeros((2, block, m))
        self.wresp_stat = np.zeros((4, n, s, m))
        self.wtarget_stat = np.zeros((2, n, m))
        self.input_blocks = np.zeros((2, block))
        self.out_overlap = np.zeros((2, cfg.num_eigenvectors, block, s))
        self.target_out_overlap = np.zeros((2, cfg.num_eigenvectors, block, s))

        self.tables: PerceptualTables | None = None
        if cfg.perceptual:
            self.tables = build_perceptual_tables(
                block,
                float(cfg.sampling_rate),
                cfg.pressure_scale_db_spl,
                cfg.threshold_method,
            )

    # -- stage 1: RIR convolution with carried lfilter state -------------
    def _update_responses(self, hop_a: np.ndarray, hop_b: np.ndarray) -> None:
        cfg = self.cfg
        hops = [hop_a, hop_b]
        rirs = [self.rir_a, self.rir_b]
        # Paths: (signal, rir destination): 0=(A,A) 1=(A,B) 2=(B,A) 3=(B,B).
        for p, (sig, dest) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            for mi in range(cfg.num_mics):
                for si in range(cfg.num_srcs):
                    out, zf = scipy.signal.lfilter(
                        rirs[dest][:, si, mi],
                        1.0,
                        hops[sig],
                        zi=self.path_state[p, :, si, mi],
                    )
                    self.path_state[p, :, si, mi] = zf
                    self.resp[p, :, si, mi] = np.concatenate(
                        [self.resp[p, cfg.hop :, si, mi], out]
                    )
        for z in range(2):
            for mi in range(cfg.num_mics):
                out, zf = scipy.signal.lfilter(
                    self.target_rir[z][:, mi],
                    1.0,
                    hops[z],
                    zi=self.target_state[z, :, mi],
                )
                self.target_state[z, :, mi] = zf
                self.target_resp[z, :, mi] = np.concatenate(
                    [self.target_resp[z, cfg.hop :, mi], out]
                )

    # -- stage 2: perceptual weighting of the target path ----------------
    def _gain(self, spectrum: np.ndarray) -> np.ndarray:
        """van de Par weighting of one masker spectrum (one-sided raw
        rfft); wiring per apvast.py:313-327."""
        t = self.tables
        power = np.abs(spectrum * t.spectrum_scale) ** 2
        masker = power @ t.cfmr_sq  # (channels,)
        w_sq = t.cs * t.leff * (t.cfmr_sq @ (1.0 / (masker + t.ca)))
        g = np.sqrt(w_sq)
        if self.cfg.weighting_norm is WeightingNorm.UNIT_ONESIDED:
            g = g / np.linalg.norm(g)
        elif self.cfg.weighting_norm is WeightingNorm.UNIT_SYMMETRIC:
            g = g / np.sqrt(np.sum(g**2) + np.sum(g[1:-1] ** 2))
        elif self.cfg.weighting_norm is WeightingNorm.PRESSURE:
            g = g * 20e-6
        return g

    def _update_weighted_target(self) -> None:
        cfg = self.cfg
        hop, n = cfg.hop, cfg.statistics_buffer_length
        self.weighting = np.ones((2, cfg.num_bins, cfg.num_mics))
        for z in range(2):
            spectra = np.fft.rfft(
                self.window[:, None] * self.target_resp[z], axis=0
            )
            if cfg.perceptual:
                for mi in range(cfg.num_mics):
                    self.weighting[z, :, mi] = self._gain(spectra[:, mi])
            weighted = spectra * self.weighting[z]
            new = self.window[:, None] * np.fft.irfft(weighted, axis=0)
            shifted = np.concatenate(
                [self.wtarget_overlap[z, hop:], np.zeros((hop, cfg.num_mics))]
            )
            self.wtarget_overlap[z] = shifted + new
            self.wtarget_stat[z] = np.concatenate(
                [self.wtarget_stat[z, hop:], self.wtarget_overlap[z, :hop]]
            )

    # -- stage 3: weighted loudspeaker responses -------------------------
    def _update_weighted_responses(self) -> None:
        cfg = self.cfg
        hop = cfg.hop
        run = [cfg.run_a, cfg.run_a, cfg.run_b, cfg.run_b]
        zone = [0, 1, 0, 1]
        for p in range(4):
            if run[p]:
                spectra = np.fft.rfft(
                    self.window[:, None, None] * self.resp[p], axis=0
                )
            else:
                spectra = np.zeros(
                    (cfg.num_bins, cfg.num_srcs, cfg.num_mics), dtype=complex
                )
            weighted = spectra * self.weighting[zone[p]][:, None, :]
            new = self.window[:, None, None] * np.fft.irfft(weighted, axis=0)
            shifted = np.concatenate(
                [
                    self.wresp_overlap[p, hop:],
                    np.zeros((hop, cfg.num_srcs, cfg.num_mics)),
                ]
            )
            self.wresp_overlap[p] = shifted + new
            self.wresp_stat[p] = np.concatenate(
                [self.wresp_stat[p, hop:], self.wresp_overlap[p, :hop]]
            )

    # -- stage 4: spatial correlation statistics -------------------------
    def _statistics(self):
        cfg = self.cfg
        jl = cfg.jl
        j = cfg.filter_length
        r_mats = np.zeros((4, jl, jl))
        r_vecs = np.zeros((2, jl))
        for p in range(4):
            for mi in range(cfg.num_mics):
                # The reference's per-source Toeplitz stack, corner
                # override included (apvast.py:334-338).
                blocks = [
                    scipy.linalg.toeplitz(
                        np.flipud(self.wresp_stat[p, :j, si, mi]),
                        self.wresp_stat[p, j:, si, mi],
                    )
                    for si in range(cfg.num_srcs)
                ]
                y = np.concatenate(blocks, axis=0)
                r_mats[p] += y @ y.T
                if p == 0:
                    r_vecs[0] += y @ self.wtarget_stat[0, j:, mi]
                elif p == 3:
                    r_vecs[1] += y @ self.wtarget_stat[1, j:, mi]
        return r_mats, r_vecs

    # -- stages 5-7: filters and outputs ---------------------------------
    def process(self, hop_a: np.ndarray, hop_b: np.ndarray):
        """One hop; returns (out_a, out_b, out_a_t, out_b_t), each a
        (V, hop, srcs) array (None for a disabled zone), matching
        apvast.py:153-165."""
        cfg = self.cfg
        hop, block, v = cfg.hop, cfg.block_size, cfg.num_eigenvectors
        j, s = cfg.filter_length, cfg.num_srcs

        self._update_responses(hop_a, hop_b)
        self._update_weighted_target()
        self._update_weighted_responses()
        r_mats, r_vecs = self._statistics()

        # GEVD per enabled zone (apvast.py:378-387).
        pencils = {0: (r_mats[0], r_mats[1]), 1: (r_mats[3], r_mats[2])}
        w_family = np.zeros((2, v, cfg.jl))
        for z, enabled in enumerate([cfg.run_a, cfg.run_b]):
            if not enabled:
                continue
            u, lam = reference_jdiag(*pencils[z], reg=cfg.reg_b)
            coef = (u[:, :v].T @ r_vecs[z]) / (lam[:v] + cfg.mu)
            w_family[z] = np.cumsum(coef[:, None] * u[:, :v].T, axis=0)

        # Shared zone-A target filter (apvast.py:389-390).
        target_filter = np.zeros((s, j))
        target_filter[cfg.reference_index_a, cfg.modeling_delay] = 1.0
        t_spec = np.fft.rfft(target_filter, n=block, axis=-1).T  # (bins, s)

        # Input block slide + spectra (apvast.py:424-431).
        self.input_blocks = np.concatenate(
            [self.input_blocks[:, hop:], np.stack([hop_a, hop_b])], axis=1
        )
        in_spec = np.fft.rfft(self.window * self.input_blocks, axis=1)

        # Per-rank output synthesis (apvast.py:445-504).
        outs = [None, None]
        t_outs = [None, None]
        for z, enabled in enumerate([cfg.run_a, cfg.run_b]):
            filt_spec = np.fft.rfft(
                w_family[z].reshape(v, s, j), n=block, axis=-1
            )  # (v, s, bins)
            out_spec = in_spec[z][None, None, :] * filt_spec
            new = np.fft.irfft(out_spec, n=block, axis=-1) * self.window
            shifted = np.concatenate(
                [self.out_overlap[z, :, hop:], np.zeros((v, hop, s))], axis=1
            )
            # overlap buffers are (v, block, s); new is (v, s, block).
            self.out_overlap[z] = shifted + new.transpose(0, 2, 1)
            if enabled:
                outs[z] = self.out_overlap[z, :, :hop, :].copy()

            t_out_spec = in_spec[z][None, :] * t_spec.T  # (s, bins)
            t_new = np.fft.irfft(t_out_spec, n=block, axis=-1) * self.window
            t_shifted = np.concatenate(
                [self.target_out_overlap[z, :, hop:], np.zeros((v, hop, s))],
                axis=1,
            )
            self.target_out_overlap[z] = t_shifted + t_new.T[None]
            t_outs[z] = self.target_out_overlap[z, :, :hop, :].copy()

        return outs[0], outs[1], t_outs[0], t_outs[1]
