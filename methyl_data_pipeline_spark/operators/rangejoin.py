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
    keys: list[str] | None = None,
) -> DataFrame:
    """Join point rows to every interval row with lo <= p <= hi,
    optionally also matching on equi-``keys`` (shared columns).

    ``bucket_width`` tunes the trade: smaller → more bucket copies per
    interval, fewer false candidates; a value near the typical interval
    length keeps the fan-out ≈ 2. ``keys`` matter at scale: joining on
    the bucket alone makes every co-bucketed pair a candidate across
    ALL key groups — with them, the shuffle key is (keys..., bucket)
    and candidate volume tracks per-key density. ``how='inner'`` only
    (the bucketed decomposition does not preserve non-matching rows).
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    w = float(bucket_width)
    if not w > 0:
        # floor(x / 0) is NULL in non-ANSI mode -> sequence(NULL, NULL)
        # -> every interval silently drops; fail loudly instead
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    for df, side in ((points, "points"), (intervals, "intervals")):
        if "_bucket" in df.columns:
            raise ValueError(
                f"{side} already has a column named '_bucket' "
                "(reserved by range_join); rename it first"
            )
    join_cols = (keys or []) + ["_bucket"]
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
        b_pts.join(b_int, join_cols)
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-interval overlap join: pairs where
    ``l_lo <= r_hi AND r_lo <= l_hi``. Both sides explode to their
    covered buckets and equi-join on the bucket; a pair sharing k
    buckets would match k times, so the residual predicate also pins
    the match to the canonical bucket — the one containing
    ``greatest(l_lo, r_lo)`` (the overlap start) — making each
    overlapping pair match exactly once with no distinct pass.
    """
    w = float(bucket_width)
    if not w > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    for df, side in ((left, "left"), (right, "right")):
        if "_bucket" in df.columns:
            raise ValueError(
                f"{side} already has a column named '_bucket' "
                "(reserved by interval_overlap_join); rename it first"
            )

    def buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / w).cast("long"),
                    F.floor(F.col(hi) / w).cast("long"),
                )
            ),
        )

    bl = buckets(left, l_lo, l_hi)
    br = buckets(right, r_lo, r_hi)
    overlap_start_bucket = F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / w).cast("long")
    return (
        bl.join(br, "_bucket")
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col("_bucket") == overlap_start_bucket)
        )
        .drop("_bucket")
    )
