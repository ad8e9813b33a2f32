"""Top-k operators (reference W1/O1/O2, SURVEY §2.5-2.6)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_by(df: DataFrame, order_col: str | Column, k: int, ascending: bool = False,
             tiebreak: str | None = None) -> DataFrame:
    """Global top-k. Reference W1/O1 (top10k.py:11, workflow.R:156-158).

    ``orderBy().limit(k)`` plans as TakeOrderedAndProject — each task
    keeps a k-sized heap, only k rows per partition reach the driver;
    no global sort even at 100 TB. ``tiebreak`` adds a deterministic
    secondary key so results are stable under equal values.
    """
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [c.asc() if ascending else c.desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, ascending: bool = False,
    tiebreak: str | None = None, rank_name: str = "rank",
) -> DataFrame:
    """Per-group top-k via row_number window — single shuffle on the
    group key; AQE handles skewed groups."""
    c = F.col(order_col)
    order = [c.asc() if ascending else c.desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def approx_quantiles_per_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probabilities: list[float] = (0.25, 0.5, 0.75),
    relative_error: float = 1e-4,
) -> DataFrame:
    """Approximate per-group quantiles via Spark's Greenwald–Khanna
    sketch (``approx_percentile``) — the 100-TB companion to the exact
    ``percentile`` aggregate: the exact form buffers every group value
    on one reducer; the sketch is fixed-size (O(1/relative_error)
    per group), merges associatively in partial aggregation, and
    guarantees rank error <= relative_error * n.
    """
    probs = ", ".join(str(p) for p in probabilities)
    agg_expr = F.expr(
        f"approx_percentile({value_col}, array({probs}), {int(1 / relative_error)})"
    ).alias("_qs")
    out = df.groupBy(*group_cols).agg(agg_expr)
    names = [f"q{round(p * 100)}" if round(p * 100) == p * 100
             else f"q{str(p).replace('0.', '')}" for p in probabilities]
    if len(set(names)) != len(names):
        raise ValueError(f"probabilities map to colliding column names: {names}")
    for i, name in enumerate(names):
        out = out.withColumn(name, F.col("_qs")[i])
    return out.drop("_qs")
