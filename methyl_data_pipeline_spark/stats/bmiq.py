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


def _prep_fit_values(values: np.ndarray, nfit: int | None, seed: int):
    """Shared EM-input prep: drop 0/1/NaN, seeded ``nfit`` subsample
    (identity below the cap; ``nfit=None`` disables capping), clip into
    the open interval. Returns the fit vector or None when infeasible
    (<10 usable values)."""
    v = values[(values > 0.0) & (values < 1.0) & ~np.isnan(values)]
    if v.size < 10:
        return None
    if nfit is not None and v.size > nfit:
        # sort BEFORE the positional draw: applyInPandas delivers the
        # group in shuffle-fetch order, so seeded positions over the
        # raw order would pick different VALUES run-to-run — sorting
        # makes the documented determinism hold on the subsample path
        rng = np.random.RandomState(seed)
        v = np.sort(v)[rng.choice(v.size, nfit, replace=False)]
    return np.clip(v, 1e-6, 1.0 - 1e-6)


def _init_components(v: np.ndarray):
    """Deterministic EM init: tercile split into hard U/H/M
    responsibilities. Boundaries are LOWER order statistics
    (``sorted[floor((n-1)*q)]``) rather than interpolated quantiles:
    an interpolated boundary is arithmetic whose last-ulp rounding
    differs between engines (numpy's ``lo + frac*(hi-lo)`` vs SQL
    lerp), and with duplicate grid values sitting exactly on the
    boundary that one ulp flips whole tie-groups between classes —
    order statistics are data elements, bit-identical everywhere.
    Returns (quantile pair, resp matrix)."""
    sv = np.sort(v)
    q = (
        sv[int(np.floor((v.size - 1) * (1 / 3)))],
        sv[int(np.floor((v.size - 1) * (2 / 3)))],
    )
    resp = np.zeros((v.size, 3))
    resp[v <= q[0], 0] = 1.0
    resp[(v > q[0]) & (v <= q[1]), 1] = 1.0
    resp[v > q[1], 2] = 1.0
    return q, resp


def _moment_ab(v: np.ndarray, wk: np.ndarray):
    """Weighted moment-matched beta parameters — the warm start each
    M-step's weighted MLE refines. Returns (mean, var, a0, b0) or None
    on an empty component."""
    sw = wk.sum()
    if sw < 1e-9:
        return None
    m = float((wk * v).sum() / sw)
    var = float((wk * (v - m) ** 2).sum() / sw)
    var = max(var, 1e-6)
    common = m * (1 - m) / var - 1.0
    common = max(common, 1e-3)
    return m, var, max(m * common, 1e-3), max((1 - m) * common, 1e-3)


def _fit_beta3(
    values: np.ndarray,
    nfit: int | None,
    seed: int,
    n_iter: int,
    tol: float,
    with_diagnostics: bool = False,
):
    """3-state 1-D beta mixture via EM with moment-matched M-step.

    Returns (a[3], b[3], w[3]) sorted by component mean (U < H < M),
    or None when the fit is not feasible. With
    ``with_diagnostics=True`` returns (a, b, w, grad[3, 2]): per sorted
    component the absolute weighted-MLE gradient residuals
    ``|ψ(a)−ψ(a+b)−s1|, |ψ(b)−ψ(a+b)−s2|`` evaluated at the returned
    (a, b) against the responsibilities the final M-step consumed —
    ~0 whenever the Newton solve met its 1e-10 tolerance.
    """
    v = _prep_fit_values(values, nfit, seed)
    if v is None:
        return None
    _, resp = _init_components(v)

    from methyl_data_pipeline_spark.stats import special

    a = np.ones(3)
    b = np.ones(3)
    w = resp.mean(axis=0)
    resp_m = resp
    prev_ll = -np.inf
    for _ in range(n_iter):
        # M-step: per-component (a, b). Weighted moments give the
        # warm start; the RPMM-betaEst weighted MLE (Newton on the
        # digamma system, special.beta_mle_weighted) refines it —
        # matching the reference's per-class beta fit
        # (bmiq/BMIQ_1.4.R:69-76) instead of stopping at moments.
        resp_m = resp
        for k in range(3):
            mo = _moment_ab(v, resp[:, k])
            if mo is None:
                return None
            _m, _var, a0, b0 = mo
            a[k], b[k] = special.beta_mle_weighted(v, resp[:, k], a0, b0)
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
    if not with_diagnostics:
        return a[order], b[order], w[order]
    grad = np.zeros((3, 2))
    for k in range(3):
        wk = resp_m[:, k]
        sw = wk.sum()
        s1 = float((wk * np.log(v)).sum() / sw)
        s2 = float((wk * np.log1p(-v)).sum() / sw)
        psi_ab = float(special.digamma(a[k] + b[k]))
        grad[k, 0] = abs(float(special.digamma(a[k])) - psi_ab - s1)
        grad[k, 1] = abs(float(special.digamma(b[k])) - psi_ab - s2)
    return a[order], b[order], w[order], grad[order]


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
    # the declared schema mirrors the SELECTED columns — a hardcoded
    # run/det_p entry would crash inputs that legitimately lack them
    types = {
        "probe_id": "string", "sample_id": "string", "run": "string",
        value_col: "double", "det_p": "double", "design_type": "int",
    }
    schema = ", ".join(f"{c} {types[c]}" for c in present)
    schema += ", beta_bmiq double, bmiq_ok boolean"
    return joined.select(*present).groupBy("sample_id").applyInPandas(per_sample, schema)


def bmiq_prefix(
    meth: DataFrame,
    probes: DataFrame,
    value_col: str = "beta",
    nfit: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """The deterministic prefix of BMIQ's per-sample EM, exposed as a
    queryable result: per (sample, design type, component) the tercile
    class boundaries, hard-assignment counts, and the moment-matched
    ``(a0, b0)`` warm starts that the first M-step's weighted MLE
    consumes (reference ``bmiq/BMIQ_1.4.R:39-76``; init structure of
    RPMM ``blc``).

    ``nfit`` defaults to None here (unlike :func:`bmiq_normalize`'s
    10 000): the prefix is the ORACLE anchor for M3, and the DuckDB
    side always uses every row, so an RNG subsample above the cap
    would silently desynchronize the engines at larger scales (the
    round-4 advisor repro at sf0.1). With no cap the whole prefix is
    closed-form SQL at any scale. Uses the exact same prep/init/moment
    code paths as :func:`bmiq_normalize` (``_prep_fit_values`` /
    ``_init_components`` / ``_moment_ab``).
    """
    from methyl_data_pipeline_spark.deploy import ensure_importable

    ensure_importable(meth.sparkSession)
    joined = meth.join(
        F.broadcast(probes.select("probe_id", "design_type")), "probe_id", "left"
    )
    schema = (
        "sample_id string, design_type int, comp int, n_comp long, "
        "q_lo double, q_hi double, mean double, var double, "
        "a0 double, b0 double"
    )

    def per_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        sid = str(pdf["sample_id"].iloc[0])
        local_seed = (seed + (zlib.crc32(sid.encode()) % (1 << 20))) % (1 << 31)
        beta = pdf[value_col].to_numpy(dtype=float)
        design = pdf["design_type"].fillna(2).to_numpy(dtype=int)
        rows = []
        for t, s in ((1, local_seed), (2, local_seed + 1)):
            v = _prep_fit_values(beta[design == t], nfit, s)
            if v is None:
                continue
            q, resp = _init_components(v)
            for k in range(3):
                mo = _moment_ab(v, resp[:, k])
                if mo is None:
                    continue
                m, var, a0, b0 = mo
                rows.append(
                    (sid, t, k, int(resp[:, k].sum()),
                     float(q[0]), float(q[1]), m, var, a0, b0)
                )
        return pd.DataFrame(
            rows,
            columns=[
                "sample_id", "design_type", "comp", "n_comp",
                "q_lo", "q_hi", "mean", "var", "a0", "b0",
            ],
        )

    return (
        joined.select("sample_id", value_col, "design_type")
        .groupBy("sample_id")
        .applyInPandas(per_sample, schema)
    )


def bmiq_mstep_certificate(
    meth: DataFrame,
    probes: DataFrame,
    value_col: str = "beta",
    n_iter: int = 25,
    tol: float = 1e-3,
    seed: int = 42,
) -> DataFrame:
    """Optimality CERTIFICATE for BMIQ's EM M-steps: run the full
    production EM (:func:`bmiq_normalize` defaults, subsampling
    disabled) per (sample, design type), then emit per sorted component
    the absolute weighted-MLE gradient residuals at the returned
    ``(a, b)`` against the responsibilities the final M-step consumed::

        grad_a = |ψ(a) − ψ(a+b) − Σw·ln(x)/Σw|
        grad_b = |ψ(b) − ψ(a+b) − Σw·ln(1−x)/Σw|

    Both are ≲1e-9 (the Newton solve's 1e-10 tolerance through the
    digamma curvature) — exactly 0 at 6-dp rounding — for every
    component the EM fits, independent of partitioning. A DuckDB
    oracle derives the identical (sample, type, comp) key set from the
    deterministic prefix and asserts literal zeros — certifying that
    every M-step inside the otherwise rows-only EM solves its
    estimating equations (reference ``bmiq/BMIQ_1.4.R:69-76``, RPMM
    ``betaEst``), the same pattern ``combat_converged`` uses for M2.
    """
    from methyl_data_pipeline_spark.deploy import ensure_importable

    ensure_importable(meth.sparkSession)
    joined = meth.join(
        F.broadcast(probes.select("probe_id", "design_type")), "probe_id", "left"
    )
    schema = (
        "sample_id string, design_type int, comp int, "
        "grad_a_residual double, grad_b_residual double"
    )

    def per_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        sid = str(pdf["sample_id"].iloc[0])
        local_seed = (seed + (zlib.crc32(sid.encode()) % (1 << 20))) % (1 << 31)
        beta = pdf[value_col].to_numpy(dtype=float)
        design = pdf["design_type"].fillna(2).to_numpy(dtype=int)
        rows = []
        for t, s in ((1, local_seed), (2, local_seed + 1)):
            fit = _fit_beta3(
                beta[design == t], None, s, n_iter, tol, with_diagnostics=True
            )
            if fit is None:
                continue
            _a, _b, _w, grad = fit
            for k in range(3):
                rows.append((sid, t, k, float(grad[k, 0]), float(grad[k, 1])))
        return pd.DataFrame(
            rows,
            columns=[
                "sample_id", "design_type", "comp",
                "grad_a_residual", "grad_b_residual",
            ],
        )

    return (
        joined.select("sample_id", value_col, "design_type")
        .groupBy("sample_id")
        .applyInPandas(per_sample, schema)
    )
