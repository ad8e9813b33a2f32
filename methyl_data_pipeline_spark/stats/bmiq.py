"""BMIQ (Beta-MIxture Quantile) intra-sample normalization.

Reference M3: ``bmiq/BMIQ_1.4.R`` (Teschendorff et al. 2013, public
algorithm) driven per sample by ``bmiq/DoBMIQ.R:108-155``, which
persists per-sample ``.Rd`` files as a file-based shuffle. Here the
whole per-sample loop is one ``groupBy(sample_id).applyInPandas`` —
BMIQ is perfectly sample-parallel (each sample's normalization touches
only its own betas plus the shared probe-design annotation), so Spark's
shuffle replaces the reference's process forks + temp files.

Algorithm per sample (matching BMIQ_1.4.R structure):
  1. fit a 3-state beta mixture (U/H/M) to Type I probes via EM on an
     ``nfit``-probe seeded subsample (BMIQ_1.4.R:39,69-70);
  2. same for Type II probes (:121-122);
  3. map Type II U-class betas onto the Type I U component by
     pbeta→qbeta quantile transfer (:163-170);
  4. same for the M class, mirrored (:171-181);
  5. conformal shift+dilation of the middle (hemimethylated) class so
     it spans the gap between the mapped U max and M min (:184-207);
  6. Type I betas pass through unchanged (:210).

The EM M-step fits each class by weighted maximum likelihood
(``special.beta_mle_weighted`` — Newton on the digamma system,
moment-warm-started), matching RPMM's ``betaEst`` inner optimization
(BMIQ_1.4.R:69-76); if the Newton degenerates it falls back to the
moments estimate. The EM is capped like the reference (th=5 iterations
default there; we default higher with the same tolerance semantics).

Guard rails from DoBMIQ.R:92-141: samples lacking >=``min_class`` probes
per inferred class, or with <2 Type I probes, pass through unnormalized
(flagged in the ``bmiq_ok`` column).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _fit_beta3(values: np.ndarray, nfit: int, seed: int, n_iter: int, tol: float):
    """3-state 1-D beta mixture via EM with moment-matched M-step.

    Returns (a[3], b[3], w[3]) sorted by component mean (U < H < M),
    or None when the fit is not feasible.
    """
    v = values[(values > 0.0) & (values < 1.0) & ~np.isnan(values)]
    if v.size < 10:
        return None
    rng = np.random.RandomState(seed)
    if v.size > nfit:
        v = v[rng.choice(v.size, nfit, replace=False)]
    v = np.clip(v, 1e-6, 1.0 - 1e-6)

    # init: quantile-split into 3 classes (deterministic)
    q = np.quantile(v, [1 / 3, 2 / 3])
    resp = np.zeros((v.size, 3))
    resp[v <= q[0], 0] = 1.0
    resp[(v > q[0]) & (v <= q[1]), 1] = 1.0
    resp[v > q[1], 2] = 1.0

    from methyl_data_pipeline_spark.stats import special

    a = np.ones(3)
    b = np.ones(3)
    w = resp.mean(axis=0)
    prev_ll = -np.inf
    for _ in range(n_iter):
        # M-step: per-component (a, b). Weighted moments give the
        # warm start; the RPMM-betaEst weighted MLE (Newton on the
        # digamma system, special.beta_mle_weighted) refines it —
        # matching the reference's per-class beta fit
        # (bmiq/BMIQ_1.4.R:69-76) instead of stopping at moments.
        for k in range(3):
            wk = resp[:, k]
            sw = wk.sum()
            if sw < 1e-9:
                return None
            m = float((wk * v).sum() / sw)
            var = float((wk * (v - m) ** 2).sum() / sw)
            var = max(var, 1e-6)
            common = m * (1 - m) / var - 1.0
            common = max(common, 1e-3)
            a0 = max(m * common, 1e-3)
            b0 = max((1 - m) * common, 1e-3)
            a[k], b[k] = special.beta_mle_weighted(v, wk, a0, b0)
        w = resp.mean(axis=0)
        # E-step
        dens = np.stack([w[k] * special.beta_pdf(v, a[k], b[k]) for k in range(3)], axis=1)
        tot = dens.sum(axis=1, keepdims=True)
        tot[tot <= 0] = 1e-300
        resp = dens / tot
        ll = float(np.log(tot).sum())
        if abs(ll - prev_ll) < tol * max(1.0, abs(prev_ll)):
            break
        prev_ll = ll

    order = np.argsort(a / (a + b))  # sort by component mean: U, H, M
    return a[order], b[order], w[order]


def _bmiq_sample(
    beta: np.ndarray, design: np.ndarray, nfit: int, seed: int, n_iter: int, tol: float,
    min_class: int,
):
    """Normalize one sample's Type II betas onto its Type I mixture.
    Returns (normalized betas, ok_flag)."""
    from methyl_data_pipeline_spark.stats import special

    out = beta.copy()
    t1 = (design == 1) & ~np.isnan(beta)
    t2 = (design == 2) & ~np.isnan(beta)
    if t1.sum() < max(2, min_class) or t2.sum() < max(2, min_class):
        return out, False

    fit1 = _fit_beta3(beta[t1], nfit, seed, n_iter, tol)
    fit2 = _fit_beta3(beta[t2], nfit, seed + 1, n_iter, tol)
    if fit1 is None or fit2 is None:
        return out, False
    a1, b1, _ = fit1
    a2, b2, w2 = fit2

    b2v = np.clip(beta[t2], 1e-6, 1 - 1e-6)
    # hard class assignment for type II probes by posterior
    dens = np.stack([w2[k] * special.beta_pdf(b2v, a2[k], b2[k]) for k in range(3)], axis=1)
    cls = dens.argmax(axis=1)
    if min(np.bincount(cls, minlength=3)) < min_class:
        return out, False

    norm = b2v.copy()
    # U class: quantile transfer onto the Type I U component
    u = cls == 0
    p = special.beta_cdf(b2v[u], a2[0], b2[0])
    norm[u] = special.beta_ppf(np.clip(p, 1e-12, 1 - 1e-12), a1[0], b1[0])
    # M class: mirrored quantile transfer
    m = cls == 2
    p = special.beta_sf(b2v[m], a2[2], b2[2])
    norm[m] = special.beta_isf(np.clip(p, 1e-12, 1 - 1e-12), a1[2], b1[2])
    # H class: conformal shift + dilation into the [max(U*), min(M*)] gap
    h = cls == 1
    if h.any():
        h_lo_old, h_hi_old = float(b2v[h].min()), float(b2v[h].max())
        lo_new = float(norm[u].max()) if u.any() else h_lo_old
        hi_new = float(norm[m].min()) if m.any() else h_hi_old
        spread = h_hi_old - h_lo_old
        if spread <= 0 or hi_new <= lo_new:
            return out, False
        norm[h] = lo_new + (b2v[h] - h_lo_old) * (hi_new - lo_new) / spread

    out2 = out.copy()
    out2[t2] = np.clip(norm, 0.0, 1.0)
    return out2, True


def bmiq_normalize(
    meth: DataFrame,
    probes: DataFrame,
    value_col: str = "beta",
    nfit: int = 10_000,
    n_iter: int = 25,
    tol: float = 1e-3,
    min_class: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Apply BMIQ per sample. Input long meth table + probe dimension
    (for ``design_type``); output adds ``beta_bmiq`` and ``bmiq_ok``.

    nfit/tol defaults mirror BMIQ_1.4.R:39 (nfit=10000, tol=1e-3);
    min_class=50 mirrors DoBMIQ.R's >=50-points-per-class guard.
    Per-sample seeds are ``seed + crc32(sample) % 2^20`` — deterministic
    across runs, partitionings, and executor placement.
    """
    from methyl_data_pipeline_spark.deploy import ensure_importable

    ensure_importable(meth.sparkSession)
    joined = meth.join(
        F.broadcast(probes.select("probe_id", "design_type")), "probe_id", "left"
    )
    schema = (
        "probe_id string, sample_id string, run string, "
        f"{value_col} double, det_p double, design_type int, "
        "beta_bmiq double, bmiq_ok boolean"
    )

    def per_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        sid = str(pdf["sample_id"].iloc[0])
        # crc32, not hash(): Python's hash is per-process salted, which
        # would make results depend on executor placement.
        local_seed = (seed + (zlib.crc32(sid.encode()) % (1 << 20))) % (1 << 31)
        beta = pdf[value_col].to_numpy(dtype=float)
        design = pdf["design_type"].fillna(2).to_numpy(dtype=int)
        normed, ok = _bmiq_sample(beta, design, nfit, local_seed, n_iter, tol, min_class)
        res = pdf.copy()
        res["beta_bmiq"] = normed
        res["bmiq_ok"] = ok
        return res

    cols = ["probe_id", "sample_id", "run", value_col, "det_p", "design_type"]
    present = [c for c in cols if c in joined.columns]
    return joined.select(*present).groupBy("sample_id").applyInPandas(per_sample, schema)
