"""Pure-NumPy special functions (no SciPy in the runtime image).

Implements the regularized incomplete beta function and its inverse via
the standard continued-fraction expansion (Lentz's algorithm, as in
Abramowitz & Stegun 26.5.8 / Numerical Recipes §6.4) plus the Student-t
survival function expressed through it. Vectorized over NumPy arrays;
accuracy ~1e-12, ample for p-values and quantile mapping.
"""

from __future__ import annotations

import math

import numpy as np

_lgamma = np.frompyfunc(math.lgamma, 1, 1)


def lgamma(x):
    # frompyfunc returns a bare Python float for 0-d input
    return np.asarray(_lgamma(np.asarray(x, dtype=float)), dtype=float)


def _betacf(a, b, x, max_iter=200, eps=3e-14):
    """Continued fraction for the incomplete beta (vectorized Lentz)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    x = np.asarray(x, float)
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    tiny = 1e-300
    d = np.where(np.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < eps):
            break
    return h


def betainc(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    x = np.clip(np.asarray(x, float), 0.0, 1.0)
    out = np.empty(np.broadcast(a, b, x).shape, float)
    a, b, x = np.broadcast_arrays(a, b, x)
    ln_front = (
        lgamma(a + b) - lgamma(a) - lgamma(b)
        + a * np.log(np.clip(x, 1e-300, None))
        + b * np.log(np.clip(1.0 - x, 1e-300, None))
    )
    front = np.exp(ln_front)
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    res = np.empty_like(out)
    if np.any(use_direct):
        res[use_direct] = (
            front[use_direct]
            * _betacf(a[use_direct], b[use_direct], x[use_direct])
            / a[use_direct]
        )
    inv = ~use_direct
    if np.any(inv):
        res[inv] = 1.0 - front[inv] * _betacf(b[inv], a[inv], 1.0 - x[inv]) / b[inv]
    res = np.where(x <= 0.0, 0.0, res)
    res = np.where(x >= 1.0, 1.0, res)
    return np.clip(res, 0.0, 1.0)


def beta_cdf(x, a, b):
    return betainc(a, b, x)


def beta_sf(x, a, b):
    return 1.0 - betainc(a, b, x)


def beta_pdf(x, a, b):
    x = np.clip(np.asarray(x, float), 1e-300, 1.0 - 1e-16)
    ln = (
        (a - 1.0) * np.log(x)
        + (b - 1.0) * np.log1p(-x)
        + lgamma(a + b) - lgamma(a) - lgamma(b)
    )
    return np.exp(ln)


def beta_ppf(p, a, b, tol=1e-12, max_iter=100):
    """Inverse regularized incomplete beta via bisection + Newton polish.
    Vectorized; p clipped to (0,1)."""
    p = np.clip(np.asarray(p, float), 1e-15, 1.0 - 1e-15)
    a = np.broadcast_to(np.asarray(a, float), p.shape).copy()
    b = np.broadcast_to(np.asarray(b, float), p.shape).copy()
    lo = np.zeros_like(p)
    hi = np.ones_like(p)
    x = np.full_like(p, 0.5)
    for _ in range(60):  # bisection: 2^-60 interval
        c = beta_cdf(x, a, b)
        too_low = c < p
        lo = np.where(too_low, x, lo)
        hi = np.where(too_low, hi, x)
        x = 0.5 * (lo + hi)
        if np.max(hi - lo) < tol:
            break
    return x


def beta_isf(q, a, b):
    return beta_ppf(1.0 - np.asarray(q, float), a, b)


def t_sf(t, df):
    """P(T_df > t), vectorized — via I_x(df/2, 1/2) at x = df/(df+t²)."""
    t = np.asarray(t, float)
    df = np.asarray(df, float)
    x = df / (df + t * t)
    tail = 0.5 * betainc(df / 2.0, 0.5, x)
    return np.where(t >= 0, tail, 1.0 - tail)


# ---------------------------------------------------------------------------
# Polygamma family + limma's F-distribution prior fit (fitFDist).
# Recurrence to push the argument above 6, then the standard asymptotic
# (Bernoulli-number) series — the same construction every numeric
# library uses; accuracy ~1e-12 on x > 0.
# ---------------------------------------------------------------------------

def digamma(x):
    """ψ(x), vectorized, x > 0."""
    x = np.atleast_1d(np.asarray(x, dtype=float)).copy()
    result = np.zeros_like(x)
    while np.any(x < 6.0):
        m = x < 6.0
        result[m] -= 1.0 / x[m]
        x[m] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    result += (
        np.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 * (1.0 / 240 - inv2 / 132))))
    )
    return result if result.shape != (1,) else float(result[0])


def trigamma(x):
    """ψ′(x), vectorized, x > 0."""
    x = np.atleast_1d(np.asarray(x, dtype=float)).copy()
    result = np.zeros_like(x)
    while np.any(x < 6.0):
        m = x < 6.0
        result[m] += 1.0 / (x[m] * x[m])
        x[m] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    # 1/x + 1/2x² + Σ B_2k / x^{2k+1}
    result += inv * (
        1.0
        + 0.5 * inv
        + inv2 * (1.0 / 6 - inv2 * (1.0 / 30 - inv2 * (1.0 / 42 - inv2 * (1.0 / 30 - inv2 * 5.0 / 66))))
    )
    return result if result.shape != (1,) else float(result[0])


def tetragamma(x):
    """ψ″(x), vectorized, x > 0 (limma's psigamma(y, deriv=2))."""
    x = np.atleast_1d(np.asarray(x, dtype=float)).copy()
    result = np.zeros_like(x)
    while np.any(x < 6.0):
        m = x < 6.0
        result[m] -= 2.0 / x[m] ** 3  # ψ″(x) = ψ″(x+1) − 2/x³
        x[m] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    # d/dx of the trigamma series
    result += -inv2 * (
        1.0
        + inv
        + inv2 * (0.5 - inv2 * (1.0 / 6 - inv2 * (1.0 / 6 - 3.0 * inv2 / 10)))
    )
    return result if result.shape != (1,) else float(result[0])


def trigamma_inverse(x: float, max_iter: int = 50, tol: float = 1e-8) -> float:
    """Solve ψ′(y) = x for y — Newton iteration exactly as limma's
    ``trigammaInverse`` (statmod/limma R source): monotone, converges
    from y₀ = 0.5 + 1/x in a handful of steps."""
    if not np.isfinite(x):
        return float("nan")
    if x > 1e7:
        return 1.0 / math.sqrt(x)
    if x < 1e-6:
        return 1.0 / x
    y = 0.5 + 1.0 / x
    for _ in range(max_iter):
        tri = trigamma(y)
        dif = tri * (1.0 - tri / x) / tetragamma(y)
        y += dif
        if -dif / y < tol:
            break
    return float(y)


def fit_f_dist(s2, df1) -> tuple[float, float]:
    """limma's ``fitFDist``: fit s² ~ s0²·F(df1, d0) by moment-matching
    on the log scale (reference eBayes, plots.R:130-139; Smyth 2004 §6).

    log(s²) has mean ψ(df1/2) − log(df1/2) + log(s0²) + [ψ(d0/2) −
    log(d0/2)] and excess variance ψ′(d0/2); invert with
    ``trigamma_inverse``. Returns ``(d0, s0_sq)``; d0 = inf when the
    empirical variance of e is at or below the pure-sampling floor.
    """
    s2 = np.asarray(s2, dtype=float)
    df1 = np.broadcast_to(np.asarray(df1, dtype=float), s2.shape)
    ok = np.isfinite(s2) & (s2 > 0) & np.isfinite(df1) & (df1 > 0)
    s2, df1 = s2[ok], df1[ok]
    if s2.size < 2:
        return float("inf"), float(np.exp(np.mean(np.log(s2)))) if s2.size else 1.0
    z = np.log(s2)
    e = z - digamma(df1 / 2.0) + np.log(df1 / 2.0)
    emean = float(e.mean())
    evar = float(e.var(ddof=1)) - float(np.mean(trigamma(df1 / 2.0)))
    if evar > 0:
        d0 = 2.0 * trigamma_inverse(evar)
        s0_sq = math.exp(emean + float(digamma(d0 / 2.0)) - math.log(d0 / 2.0))
    else:
        d0 = float("inf")
        s0_sq = math.exp(emean)
    return d0, s0_sq


def beta_mle_weighted(x, w, a0: float, b0: float, max_iter: int = 50, tol: float = 1e-10):
    """Weighted maximum-likelihood fit of Beta(a, b) — the inner
    estimator of RPMM's ``betaEst`` that BMIQ's ``blc`` EM calls per
    class (reference bmiq/BMIQ_1.4.R:69-76).

    The MLE solves  ψ(a) − ψ(a+b) = Σw·ln(x)/Σw  and
    ψ(b) − ψ(a+b) = Σw·ln(1−x)/Σw  — Newton-Raphson on the 2×2 system
    with the polygamma Jacobian, warm-started from (a0, b0) (the
    weighted-moments estimate). Step-halving keeps (a, b) positive.
    Returns (a, b); falls back to (a0, b0) if the iteration degenerates.
    """
    x = np.asarray(x, dtype=float)
    w = np.asarray(w, dtype=float)
    sw = w.sum()
    if sw <= 0 or not (np.isfinite(a0) and np.isfinite(b0)):
        return a0, b0
    s1 = float((w * np.log(x)).sum() / sw)
    s2 = float((w * np.log1p(-x)).sum() / sw)
    a, b = float(a0), float(b0)
    for _ in range(max_iter):
        psi_ab = float(digamma(a + b))
        f1 = float(digamma(a)) - psi_ab - s1
        f2 = float(digamma(b)) - psi_ab - s2
        tri_ab = float(trigamma(a + b))
        j11 = float(trigamma(a)) - tri_ab
        j22 = float(trigamma(b)) - tri_ab
        det = j11 * j22 - tri_ab * tri_ab
        if not np.isfinite(det) or abs(det) < 1e-300:
            return a0, b0
        da = -(j22 * f1 + tri_ab * f2) / det
        db = -(tri_ab * f1 + j11 * f2) / det
        step = 1.0
        while (a + step * da <= 0 or b + step * db <= 0) and step > 1e-8:
            step *= 0.5
        a += step * da
        b += step * db
        if max(abs(da), abs(db)) * step < tol * max(1.0, a, b):
            break
    if not (np.isfinite(a) and np.isfinite(b) and a > 0 and b > 0):
        return a0, b0
    return a, b
