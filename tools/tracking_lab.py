#!/usr/bin/env python
"""Prototype lab for a Cholesky-free TRACKING GEVD solver.

The production solver re-whitens from scratch every hop: Cholesky of the
(JL, JL) dark matrix + blocked triangular inversion. At JL = 1600 that
chain (plus its mask/slice HBM traffic) is the largest block of device
time in the 32-speaker hop (tools/solver_lab.py: chol 840 us, inverse
295 us, iterations only 343 us).

Idea under test: the warm-started subspace barely rotates per hop (2
power iterations suffice today), so REPLACE per-hop whitening with a
block Rayleigh-Ritz update on the exact pencil over an augmented basis

    S_t = orth([X_{t-1}, M r(X_{t-1})])        (LOBPCG-style)

where r(X) = A X - B X Theta is the block residual and M is a cheap
preconditioner (I, diag(B)^-1, block-Jacobi, or a carried inverse).
Unlike the rejected stale-preconditioner POWER iteration (see
config.py's subspace_whiten="newton" note), Rayleigh-Ritz on the exact
(A, B) pencil converges to the TRUE generalized eigenspace for ANY
full-rank M; M only sets the tracking rate. No (JL, JL) factorization
anywhere.

Usage:
  tracking_lab.py capture [hops]   # run 32-spk scene on TPU, dump pencils
  tracking_lab.py sim              # offline tracker-vs-exact comparison

Pencils land in /tmp/pencils32.npz (~40 MB/hop; not a repo artifact).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

NPZ = "/tmp/pencils32.npz"


def capture(num_hops: int = 12) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from apvast_tpu.config import production_overrides
    from apvast_tpu.engine import build_plan, init_state, process_hop
    from apvast_tpu.ops.lag_statistics import covariance_via_lags_skew
    from apvast_tpu.utils.scenes import scale_scene

    scene = scale_scene(32, **production_overrides("tpu"))
    cfg = scene.config
    plan = build_plan(cfg, scene.rir_a, scene.rir_b)
    state = init_state(cfg, key=jax.random.key(0))
    hop_fn = jax.jit(lambda s, a, b: process_hop(cfg, plan, s, a, b))

    j = cfg.filter_length

    def stats(st):
        buf = st.wresp_stat  # carried deleted form at this geometry
        k = buf.shape[-1] - j + 1
        d = st.wtarget_stat[..., -k:]
        r_mats, r_vecs = covariance_via_lags_skew(buf, d, j)
        a_stack = r_mats[jnp.asarray([0, 3])]
        b_stack = r_mats[jnp.asarray([1, 2])]
        # Engine loading (engine/hop.py stage 5): trace-relative f32
        # loading + the reference's absolute reg_b, folded in here.
        n = a_stack.shape[-1]
        eye = jnp.eye(n, dtype=a_stack.dtype)
        mean_diag = jnp.einsum("zii->z", b_stack) / n
        b_loaded = (
            b_stack
            + (cfg.effective_reg_b_relative * mean_diag)[:, None, None] * eye
            + cfg.reg_b * eye
        )
        return a_stack, b_stack, b_loaded, r_vecs

    stats_fn = jax.jit(stats)

    rng = np.random.default_rng(0)
    recs = {}
    for t in range(num_hops):
        ha = jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32)
        hb = jnp.asarray(rng.standard_normal(cfg.hop), jnp.float32)
        state, _ = hop_fn(state, ha, hb)
        a, b0, bl, r = stats_fn(state)
        recs[f"a{t}"] = np.asarray(a)
        recs[f"b0_{t}"] = np.asarray(b0)
        recs[f"bl{t}"] = np.asarray(bl)
        recs[f"r{t}"] = np.asarray(r)
        print(f"hop {t} captured", flush=True)
    np.savez(NPZ, hops=num_hops, **recs)
    print(f"wrote {NPZ}", flush=True)


# ---------------------------------------------------------------------------
# Offline simulation: exact solver vs tracking candidates, float32.
# ---------------------------------------------------------------------------


def _exact_topk(a, bl, v):
    """Float64 ground truth: top-v generalized eigenpairs, descending."""
    import scipy.linalg as sla

    n = a.shape[-1]
    w, u = sla.eigh(
        a.astype(np.float64),
        bl.astype(np.float64),
        subset_by_index=[n - v, n - 1],
    )
    return w[::-1], u[:, ::-1]  # descending


def _span_filters(u, lam, r, mu, v):
    coeffs = (u[:, :v].T @ r) / (lam[:v] + mu)
    return np.cumsum(coeffs[:, None] * u[:, :v].T, axis=0)  # (v, n)


def _contrast_proxy(w, a, b0):
    """Rayleigh-quotient contrast of one filter (dB): bright power over
    unloaded dark power on the SAME pencil the filter was built from."""
    num = float(w @ a @ w)
    den = float(w @ b0 @ w) + 1e-30
    return 10.0 * np.log10(max(num, 1e-30) / den)


def _orthonormalize(s):
    """CholeskyQR2 in float32 (matches the production orthonormalizer)."""
    for _ in range(2):
        g = (s.T @ s).astype(np.float32)
        g += np.float32(1e-6) * (np.trace(g) / g.shape[0]) * np.eye(
            g.shape[0], dtype=np.float32
        )
        l = np.linalg.cholesky(g)
        s = np.linalg.solve(l, s.T).T.astype(np.float32)  # s L^-T
    return s


def _rr_pencil(s, a, bl, v):
    """Rayleigh-Ritz on the exact pencil within span(s): returns
    (lam_desc, u_desc, c_desc) with u = s @ c, u^T bl u = I."""
    import scipy.linalg as sla

    abar = (s.T @ (a @ s)).astype(np.float64)
    bbar = (s.T @ (bl @ s)).astype(np.float64)
    abar = 0.5 * (abar + abar.T)
    bbar = 0.5 * (bbar + bbar.T)
    k = bbar.shape[0]
    bbar += (np.trace(bbar) / k) * 1e-7 * np.eye(k)
    w, c = sla.eigh(abar, bbar)
    w, c = w[::-1], c[:, ::-1]
    u = (s @ c[:, :v]).astype(np.float32)
    return w[:v].astype(np.float32), u, c


EXACT_NPZ = "/tmp/exact32.npz"


def _exact_cached(dat, hops, v):
    """Ground-truth top-v eigenpairs per (hop, zone), cached on disk —
    the f64 subset eigh at n=1600 dominates sim wall time."""
    import os

    if os.path.exists(EXACT_NPZ):
        e = np.load(EXACT_NPZ)
        if int(e["hops"]) == hops and int(e["v"]) == v:
            return e
    recs = {"hops": hops, "v": v}
    for t in range(hops):
        for zz in range(2):
            lam, u = _exact_topk(dat[f"a{t}"][zz], dat[f"bl{t}"][zz], v)
            recs[f"lam{t}_{zz}"] = lam.astype(np.float32)
            recs[f"u{t}_{zz}"] = u.astype(np.float32)
        print(f"exact hop {t} done", flush=True)
    np.savez(EXACT_NPZ, **recs)
    return np.load(EXACT_NPZ)


def sim(names: list[str] | None = None) -> None:
    dat = np.load(NPZ)
    hops = int(dat["hops"])
    v, k = 50, 64
    mu = 1.0
    rng = np.random.default_rng(7)

    n = dat["a0"].shape[-1]
    z = 2
    exact = _exact_cached(dat, hops, v)

    # name format: <blocks><steps>_<prec> where blocks 'rr' = [X, MR]
    # and 'lo' = [X, MR, P] (true LOBPCG 3-block with history), steps is
    # the per-hop iteration count, prec in {ident, diag, bj100, binv1,
    # binv8} (binvT = exact inverse of the T-hops-stale loaded dark
    # matrix — simulates a carried inverse rebuilt every T hops).
    if names is None:
        names = [
            "prod",  # current production solver: fresh Li + 2 power iters
            # Inner-outer tracking: basis [X, M R] (128), inner solve =
            # whitened power iteration at 128-dim + 64-wide RR (the
            # engine's jacobi64 budget), residuals from the PREVIOUS
            # hop's Ritz pairs (no pre-RR). 'w' = rebuild every hop for
            # t < 4 (warmup), then every T hops.
            "io1_binv1",
            "io1_binv2w",
            "io1_binv4w",
            "io2_binv4w",
            "io1_binv8w",
        ]
    trackers = {nm: {"q": [None] * z, "p": [None] * z, "minv": [None] * z}
                for nm in names}
    for nm, tr in trackers.items():
        kk = int(nm.split("@")[1]) if "@" in nm else k
        for zz in range(z):
            tr["q"][zz] = rng.standard_normal((n, kk)).astype(np.float32)

    def precondition(name, tr, zz, t, b, r):
        if "ident" in name:
            return r
        if "diag" in name:
            return r / np.diag(b)[:, None]
        if "bj100" in name:
            d = 100
            nb = n // d
            out = np.empty_like(r)
            for i in range(nb):
                sl = slice(i * d, (i + 1) * d)
                out[sl] = np.linalg.solve(b[sl, sl], r[sl])
            return out.astype(np.float32)
        if "binv" in name:
            digits = ""
            for ch in name.split("binv")[1]:
                if ch.isdigit():
                    digits += ch
                else:
                    break
            period = int(digits)
            warmup = name.endswith("w") and t < 4
            if tr["minv"][zz] is None or t % period == 0 or warmup:
                # Simulate the production rebuild: f32 Cholesky + blocked
                # triangular inverse, M = Li^T Li.
                li = np.linalg.inv(
                    np.linalg.cholesky(b.astype(np.float64))
                ).astype(np.float32)
                tr["minv"][zz] = (li.T @ li).astype(np.float32)
            return (tr["minv"][zz] @ r).astype(np.float32)
        raise ValueError(name)

    def steps_of(name):
        return int(name[2])

    def prod_solver(tr, zz, a, bl):
        """Current production solver: fresh f32 Cholesky + triangular
        inverse, 2 whitened power iterations from the warm start, then
        Rayleigh-Ritz via the whitened small matrix."""
        q = tr["q"][zz]
        li = np.linalg.inv(
            np.linalg.cholesky(bl.astype(np.float64))
        ).astype(np.float32)
        for _ in range(2):
            q = _orthonormalize((li @ (a @ (li.T @ q))).astype(np.float32))
        small = (q.T @ (li @ (a @ (li.T @ q)))).astype(np.float64)
        small = 0.5 * (small + small.T)
        w, vec = np.linalg.eigh(small)
        w, vec = w[::-1], vec[:, ::-1]
        u = (li.T @ (q @ vec)).astype(np.float32)
        tr["q"][zz] = _orthonormalize((q @ vec).astype(np.float32))
        return w.astype(np.float32), u

    print(
        f"{'hop':>3} {'zone':>4} | exact c1/cV | "
        + " | ".join(f"{nm} d1/dV" for nm in trackers)
    )
    for t in range(hops):
        for zz in range(z):
            a = dat[f"a{t}"][zz]
            b0 = dat[f"b0_{t}"][zz]
            bl = dat[f"bl{t}"][zz]
            r = dat[f"r{t}"][zz]

            lam_e = exact[f"lam{t}_{zz}"]
            u_e = exact[f"u{t}_{zz}"]
            w_e = _span_filters(u_e, lam_e, r, mu, v)
            c1_e = _contrast_proxy(w_e[0], a, b0)
            cv_e = _contrast_proxy(w_e[-1], a, b0)

            cols = []
            for name, tr in trackers.items():
                if name == "prod":
                    lam_p, u_p = prod_solver(tr, zz, a, bl)
                    w_t = _span_filters(u_p, lam_p, r, mu, v)
                    d1 = _contrast_proxy(w_t[0], a, b0) - c1_e
                    dv = _contrast_proxy(w_t[-1], a, b0) - cv_e
                    cols.append(f"{d1:+6.3f}/{dv:+6.3f}")
                    continue
                if name.startswith("io"):
                    q = tr["q"][zz]
                    lam = tr.setdefault("lam", [None] * z)[zz]
                    for _ in range(steps_of(name)):
                        ax = (a @ q).astype(np.float32)
                        bx = (bl @ q).astype(np.float32)
                        if lam is None:
                            lam = (
                                np.sum(q * ax, axis=0)
                                / np.sum(q * bx, axis=0)
                            ).astype(np.float32)
                        res = (ax - bx * lam[None, :]).astype(np.float32)
                        p = precondition(name, tr, zz, t, bl, res)
                        s = _orthonormalize(
                            np.concatenate([q, p.astype(np.float32)], axis=1)
                        )
                        # Inner inexact solve of the 128-wide RR pencil:
                        # whiten at 128-dim, warm 64-block power steps,
                        # 64-wide RR (the engine's jacobi64 budget).
                        abar = (s.T @ (a @ s)).astype(np.float32)
                        bbar = (s.T @ (bl @ s)).astype(np.float32)
                        abar = 0.5 * (abar + abar.T)
                        bbar = 0.5 * (bbar + bbar.T)
                        kk = bbar.shape[0]
                        bbar += np.float32(
                            (np.trace(bbar) / kk) * 1e-6
                        ) * np.eye(kk, dtype=np.float32)
                        l = np.linalg.cholesky(bbar)
                        li = np.linalg.inv(l).astype(np.float32)
                        wbar = (li @ abar @ li.T).astype(np.float32)
                        wbar = 0.5 * (wbar + wbar.T)
                        y = _orthonormalize(
                            np.ascontiguousarray(l.T[:, :k]).astype(
                                np.float32
                            )
                        )
                        for _pi in range(2):
                            y = _orthonormalize(
                                (wbar @ y).astype(np.float32)
                            )
                        h = (y.T @ wbar @ y).astype(np.float32)
                        h = 0.5 * (h + h.T)
                        theta, vv = np.linalg.eigh(h)
                        theta, vv = theta[::-1], vv[:, ::-1]
                        c = (li.T @ (y @ vv)).astype(np.float32)
                        q = (s @ c).astype(np.float32)  # B-orthonormal
                        lam = theta.astype(np.float32)
                    tr["q"][zz] = q
                    tr["lam"][zz] = lam
                    w_t = _span_filters(q, lam, r, mu, v)
                    d1 = _contrast_proxy(w_t[0], a, b0) - c1_e
                    dv = _contrast_proxy(w_t[-1], a, b0) - cv_e
                    cols.append(f"{d1:+6.3f}/{dv:+6.3f}")
                    continue
                q = tr["q"][zz]
                for _ in range(steps_of(name)):
                    if name.startswith("sw"):
                        # Fixed-width variant: RR at width k, then replace
                        # the bottom-g Ritz directions with preconditioned
                        # residuals of the same ranks — the small solve
                        # stays k x k (the Jacobi kernel's budget).
                        g = int(name.split("_g")[1].rstrip("w"))
                        lam, x, c = _rr_pencil(q, a, bl, k)
                        xa = (q @ c[:, :k]).astype(np.float32)
                        sel = slice(k - g, k)
                        res = (
                            a @ xa[:, sel]
                            - (bl @ xa[:, sel]) * lam[sel][None, :]
                        )
                        p = precondition(
                            name, tr, zz, t, bl, res.astype(np.float32)
                        )
                        s = np.concatenate(
                            [xa[:, : k - g], p.astype(np.float32)], axis=1
                        )
                        q = _orthonormalize(s)
                        continue
                    lam, x, _ = _rr_pencil(q, a, bl, min(k, q.shape[1]))
                    res = a @ x - (bl @ x) * lam[None, :]
                    p = precondition(name, tr, zz, t, bl, res)
                    parts = [x, p.astype(np.float32)]
                    if name.startswith("lo") and tr["p"][zz] is not None:
                        parts.append(tr["p"][zz])
                    s = _orthonormalize(np.concatenate(parts, axis=1))
                    lam2, u2, c2 = _rr_pencil(s, a, bl, k)
                    qn = (s @ c2[:, :k]).astype(np.float32)
                    if name.startswith("lo"):
                        # History block: the non-X component of the update.
                        tr["p"][zz] = _orthonormalize(
                            (qn - x @ (x.T @ qn)).astype(np.float32)[:, :k]
                        )
                    q = _orthonormalize(qn)
                lam_t, u_t, _ = _rr_pencil(q, a, bl, v)
                tr["q"][zz] = q
                w_t = _span_filters(u_t, lam_t, r, mu, v)
                d1 = _contrast_proxy(w_t[0], a, b0) - c1_e
                dv = _contrast_proxy(w_t[-1], a, b0) - cv_e
                cols.append(f"{d1:+6.3f}/{dv:+6.3f}")
            print(
                f"{t:>3} {zz:>4} | {c1_e:6.2f}/{cv_e:6.2f} | "
                + " | ".join(cols),
                flush=True,
            )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sim"
    if mode == "capture":
        capture(int(sys.argv[2]) if len(sys.argv) > 2 else 12)
    else:
        sim()
