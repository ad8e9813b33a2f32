"""pOOBAH-style empirical detection p-values (reference M4).

SeSAMe's pOOBAH (``idat.r:71-73``) scores each probe against the
empirical distribution of out-of-band (OOB) control intensities within
the same sample: det_p = 1 - ECDF_oob(intensity). The engine expresses
the per-sample ECDF lookup as ONE window pass — no per-sample loop, no
broadcast of sorted arrays:

  sort each sample's rows by intensity; a RANGE-framed running sum of
  the OOB indicator yields, for every row, the count of OOB values
  <= its intensity (RANGE, not ROWS, so tied intensities all see the
  same count — a well-defined ECDF).

The real IDAT intensity ingest is out of scope (S5 boundary); the
operator is generic over any (value, is_background) pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def ecdf_detection_p(
    df: DataFrame,
    value_col: str = "intensity",
    oob_col: str = "is_oob",
    partition_cols: tuple[str, ...] = ("sample_id",),
    out_col: str = "det_p_emp",
) -> DataFrame:
    """det_p = 1 - (# background values <= x) / (# background values),
    computed per partition (sample)."""
    part = list(partition_cols)
    oob_int = F.when(F.col(oob_col), 1).otherwise(0)
    w_range = (
        Window.partitionBy(*part)
        .orderBy(F.col(value_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    return (
        df.withColumn("_oob_le", F.sum(oob_int).over(w_range))
        .withColumn("_oob_n", F.sum(oob_int).over(w_all))
        .withColumn(
            out_col,
            # a NULL intensity has no rank — fabricating det_p for it
            # (NULLs sort first and only see null-ordered peers) would
            # report a confident p-value for a failed read
            F.when(
                F.col(value_col).isNotNull() & (F.col("_oob_n") > 0),
                1.0 - F.col("_oob_le") / F.col("_oob_n"),
            ).otherwise(F.lit(None).cast("double")),
        )
        .drop("_oob_le", "_oob_n")
    )
