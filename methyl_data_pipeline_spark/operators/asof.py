"""As-of (most-recent-prior) join — a custom operator Spark lacks.

Not in the reference (all its joins are single-key equi-joins, SURVEY
§2.3) but core to event/time-series enrichment at scale. Two
implementations, per the engine's preference order (SURVEY §2.11):

- :func:`asof_join_prior` — pure DataFrame: union both sides, one
  window pass per key carrying the last-seen right-side row via
  ``last(..., ignorenulls=True)``. One shuffle on the key, no UDF, no
  range explosion — the scalable default.
- :func:`asof_join_pandas` — ``applyInPandas`` + ``pd.merge_asof`` per
  key group; simpler semantics surface for tolerance/nearest variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left.``on`` within the same ``by`` key (strictly the most
    recent at-or-before; right rows at the same instant are visible).

    Plan: union(left ∪ right) → window per ``by`` ordered by
    (``on``, right-first) → ``last(row_struct, ignorenulls)`` carries
    the latest right ROW forward → keep left rows. Cost: one shuffle +
    one sort per key group.

    The carried unit is one STRUCT of all right value columns, not the
    columns individually: a right row whose value is NULL must still
    win (the docstring's "the right row with the greatest on" — what
    ``pd.merge_asof`` does), and multi-column carries must stay
    row-atomic. Per-column ``last(ignorenulls)`` would instead skip
    null values (serving stale data) and could mix columns from
    different right rows.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rrow"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp, so a
    # same-instant right row IS visible to the left row
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carry", F.last(F.col("_rrow"), ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[
                F.col("_carry").getField(c).alias(f"{c}{suffix}")
                for c in right_value_cols
            ],
        )
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """merge_asof variant (cogroup + pandas) — for tolerance/nearest
    semantics the window-carry form doesn't express."""
    import pandas as pd

    # output types mirror the RIGHT schema (a hardcoded type would
    # crash Arrow conversion for strings and silently downcast longs)
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema}
    out_fields = ", ".join(
        f"`{c}{suffix}` {rtypes[c]}" for c in right_value_cols
    )
    left_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema)
    schema = f"{left_schema}, {out_fields}"

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=list(lpdf.columns) + [f"{c}{suffix}" for c in right_value_cols])
        lpdf = lpdf.sort_values(on)
        rp = rpdf[[on, *right_value_cols]].sort_values(on)
        merged = pd.merge_asof(
            lpdf, rp, on=on, direction="backward", suffixes=("", suffix)
        )
        for c in right_value_cols:
            if c in lpdf.columns:  # pandas suffixing applied
                continue
            merged = merged.rename(columns={c: f"{c}{suffix}"})
        return merged

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(merge, schema)
