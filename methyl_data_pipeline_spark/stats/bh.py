"""Benjamini-Hochberg FDR adjustment as a pure window program.

Reference A14/W2: ``p.adjust(p, method="BH")`` at ``plots.R:162``,
``test.R:118``. Exact step-up rank arithmetic — no UDF:

    rank_i   = row_number over p ascending
    q_i      = p_i * N / rank_i
    adj_i    = min(q_j : rank_j >= rank_i)  (running min from the right)
    clipped to 1.

Ties: the running min from the largest rank makes the result identical
for any permutation of tied p-values (all tied entries receive the
minimum of everything at-or-after them), matching R's ``p.adjust``.

Scale note: BH is inherently a global-rank operator, so this is one of
the few places a total order is required. The window uses a single
ordering pass (range-partitioned sort at scale); N comes from a count
aggregate, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bh_adjust(
    df: DataFrame, p_col: str = "p_value", out_col: str = "adj_p",
    assume_no_nulls: bool = False,
) -> DataFrame:
    """Append BH-adjusted p-values. Null p-values are left null and are
    excluded from N, matching R's na-handling.

    N comes from a window count over the same (already single-partition)
    global ordering — not an eager ``count()`` action, which would run
    the entire upstream plan twice.

    ``assume_no_nulls``: skip the null-branch split. Matters when p_col
    is a Python-UDF column — the isNull/isNotNull filters otherwise get
    pushed into upstream joins (forcing a plan rewrite) and compute the
    UDF once per branch.
    """
    w_rank = Window.orderBy(F.col(p_col).asc())
    w_all = Window.partitionBy()
    # cummin MUST run over rank desc, not p desc: under tied p-values a
    # p-ordered window can visit equal-p rows in either order and the
    # higher-ranked twin would miss its partner's smaller q.
    w_cummin = (
        Window.orderBy(F.col("_rank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df if assume_no_nulls else df.filter(F.col(p_col).isNotNull())
    nonnull = (
        base.withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_q", F.col(p_col) * F.col("_n") / F.col("_rank"))
        .withColumn(out_col, F.least(F.min("_q").over(w_cummin), F.lit(1.0)))
        .drop("_rank", "_q", "_n")
    )
    if assume_no_nulls:
        return nonnull
    nulls = df.filter(F.col(p_col).isNull()).withColumn(out_col, F.lit(None).cast("double"))
    return nonnull.unionByName(nulls)
