"""Range (interval) join — points matched to overlapping intervals.

Spark has no native interval join; the naive formulation
``points.join(intervals, (p >= lo) & (p <= hi))`` is a theta join —
BroadcastNestedLoopJoin, O(n·m) comparisons, and a broadcast
requirement on one side. The scalable form is bucket expansion:

  - choose a bucket width w;
  - each interval explodes into the buckets it overlaps
    (floor(lo/w) .. floor(hi/w) — bounded fan-out when interval
    lengths are bounded by ~w);
  - each point maps to its single bucket floor(p/w);
  - equi-join on the bucket key (hash-partitioned shuffle, AQE-
    skew-handled), then the exact residual predicate filters.

Cost tracks matches + interval_length/w fan-out instead of n·m.
The same pattern handles interval-interval overlap joins (explode
both sides). This is the classic spatial-grid / Interval-bucketing
technique used by time-series and genomics engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with lo <= p <= hi.

    ``bucket_width`` tunes the trade: smaller → more bucket copies per
    interval, fewer false candidates; a value near the typical interval
    length keeps the fan-out ≈ 2. ``how='inner'`` only (the bucketed
    decomposition does not preserve non-matching rows).
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    w = float(bucket_width)
    b_int = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    b_pts = points.withColumn("_bucket", F.floor(F.col(point_col) / w).cast("long"))
    return (
        b_pts.join(b_int, "_bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bucket")
    )
