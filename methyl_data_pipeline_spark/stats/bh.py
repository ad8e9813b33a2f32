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

from methyl_data_pipeline_spark import cache


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


def bh_adjust_scalable(
    df: DataFrame,
    p_col: str = "p_value",
    out_col: str = "adj_p",
    num_partitions: int | None = None,
    assume_no_nulls: bool = False,
) -> DataFrame:
    """BH without the single global window — the 100-TB path.

    :func:`bh_adjust` is exact but funnels every row through ONE
    window partition (Spark's global-order limitation); at 10⁹ probes
    that partition is the job. This variant keeps the data distributed:

    1. ``repartitionByRange`` on p — rows are globally ordered ACROSS
       partitions, each partition sorts locally (parallel).
    2. Global rank = local ``row_number`` + a per-partition row-count
       prefix sum. The counts are one tiny aggregate (num_partitions
       rows) collected and broadcast back as a literal map.
    3. The right-to-left running min of q decomposes the same way:
       a parallel per-partition suffix min + the suffix min over later
       partitions' q-minima (same tiny aggregate, scanned driver-side).

    Two driver round-trips of O(num_partitions) scalars replace the
    all-data shuffle to one task. Results are bit-identical to
    :func:`bh_adjust` (ties included: tied p-values may straddle a
    partition boundary, but the suffix-min from the right sees across
    it exactly like the single window does).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    nonnull = df if assume_no_nulls else df.filter(F.col(p_col).isNotNull())
    ranged = nonnull.repartitionByRange(num_partitions, F.col(p_col).asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(F.col(p_col).asc())
    # persisted: the two scalar collects below + the caller's action
    # would otherwise re-derive the range sort three times (and a
    # nondeterministic upstream could diverge between passes)
    local = cache.track(ranged.withColumn("_lrank", F.row_number().over(w_local)))

    # tiny aggregate: per-partition row counts -> rank offsets
    stats = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).orderBy("_pid")
    ).collect()
    n_total = sum(r["_cnt"] for r in stats)
    offsets: dict[int, int] = {}
    acc = 0
    for r in stats:
        offsets[r["_pid"]] = acc
        acc += r["_cnt"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    q = local.withColumn(
        "_q",
        F.col(p_col) * F.lit(float(n_total)) / (F.col("_lrank") + off_map[F.col("_pid")]),
    )

    # parallel per-partition suffix min of q (from the high-p side)
    w_suffix = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_lrank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = q.withColumn("_smin", F.min("_q").over(w_suffix))

    # tiny aggregate #2: per-partition q minima -> suffix over LATER
    # partitions, broadcast back as a map
    qmins = {r["_pid"]: r["_m"] for r in q.groupBy("_pid").agg(F.min("_q").alias("_m")).collect()}
    later_min: dict[int, float] = {}
    running = float("inf")
    for pid in sorted(qmins, reverse=True):
        later_min[pid] = running
        running = min(running, qmins[pid])
    later_map = F.create_map(
        *[F.lit(x) for kv in later_min.items() for x in kv]
    )

    out = q.withColumn(
        out_col,
        F.least(
            F.least(F.col("_smin"), F.coalesce(later_map[F.col("_pid")], F.lit(float("inf")))),
            F.lit(1.0),
        ),
    ).drop("_pid", "_lrank", "_q", "_smin")
    if assume_no_nulls:
        return out
    nulls = df.filter(F.col(p_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return out.unionByName(nulls)


def bh_adjust_grouped(
    df: DataFrame,
    p_col: str = "p_value",
    out_col: str = "adj_p",
    assume_no_nulls: bool = False,
) -> DataFrame:
    """BH via the DISTINCT-p table — the fastest exact path when the
    p-values have bounded cardinality (e.g. pre-rounded to 6 dp, at
    most ~10⁶ distinct values however many rows there are).

    Within a tied group the minimum of p·N/rank lands at the group's
    LARGEST rank, so BH only needs per-distinct-p (count, max-rank):

    1. one map-side-combining groupBy(p) — shuffles the distinct
       values, never the rows;
    2. rank/suffix-min windows over that tiny frame (≤10⁶ rows in one
       task — constant work at ANY fact scale);
    3. a broadcast join maps adj_p back — the fact table is never
       shuffled at all.

    Bit-identical to :func:`bh_adjust` / :func:`bh_adjust_scalable`
    (the surviving q per tie group is the same ``p * N / maxrank``
    double). Precondition: distinct-p cardinality must fit one task;
    for unbounded raw p-values use :func:`bh_adjust_scalable`.
    """
    nonnull = df if assume_no_nulls else df.filter(F.col(p_col).isNotNull())
    dist = nonnull.groupBy(p_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_ord = Window.orderBy(F.col(p_col).asc())
    w_all = Window.partitionBy()
    w_suffix = (
        Window.orderBy(F.col(p_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adj = (
        dist.withColumn("_maxrank", F.sum("_cnt").over(w_ord))
        .withColumn("_n", F.sum("_cnt").over(w_all))
        .withColumn("_q", F.col(p_col) * F.col("_n") / F.col("_maxrank"))
        .withColumn(out_col, F.least(F.min("_q").over(w_suffix), F.lit(1.0)))
        .select(p_col, out_col)
    )
    out = nonnull.join(F.broadcast(adj), p_col)
    if assume_no_nulls:
        return out
    nulls = df.filter(F.col(p_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return out.unionByName(nulls)
