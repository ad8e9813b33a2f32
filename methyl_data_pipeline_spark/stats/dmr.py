"""Differentially methylated region (DMR) calling.

Bumphunter-family region detection (minfi ``bumphunter`` / DMRcate):
collapse per-probe differential statistics into genomic REGIONS —
maximal runs of same-direction, above-cutoff probes with inter-probe
gaps bounded by ``maxgap``. The reference pipeline stops at per-probe
moderated t (``plots.R:130-149``); region calling is the standard next
step of the toolchain and is pure relational algebra, so it belongs in
the engine.

Spark shape: one hash shuffle on chromosome for the ordered window
(chromosomes are a natural, bounded partitioning — ~10² keys with
~10⁴-10⁶ probes each, far under a window-partition's capacity), then a
groupBy on (chrom, segment). The segmentation trick is the same
lag-break + running-sum used by sessionization: a probe starts a new
region when the gap to its predecessor exceeds ``maxgap`` or the
effect direction flips. No UDFs; the whole plan is
whole-stage-codegen'd and reproduces exactly in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def call_dmrs(
    stats_df: DataFrame,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    stat_col: str = "t_mod",
    cutoff: float = 1.0,
    maxgap: int = 5,
    min_probes: int = 2,
) -> DataFrame:
    """Regions of consecutive probes with ``|stat| >= cutoff``, same
    direction, and gaps ``<= maxgap``; regions with fewer than
    ``min_probes`` probes are dropped (singleton bumps are noise).

    Returns one row per region: chrom, start_pos, end_pos, n_probes,
    mean_stat (average of the member probes' statistic), direction
    (+1/-1).
    """
    cand = stats_df.filter(F.abs(F.col(stat_col)) >= cutoff).withColumn(
        "_sign", F.signum(F.col(stat_col))
    )
    # deterministic under position ties: order carries the statistic
    # as tiebreak, and the segment-id cumsum uses a ROWS frame — the
    # default RANGE frame would hand tied rows a shared cumulative sum
    # (and lag() an arbitrary peer), letting one region swallow
    # opposite-sign probes at the same locus with partition-dependent
    # output.
    w = Window.partitionBy(chrom_col).orderBy(pos_col, stat_col)
    w_seg = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        cand.withColumn("_prev_pos", F.lag(pos_col).over(w))
        .withColumn("_prev_sign", F.lag("_sign").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev_pos").isNull()
                | (F.col(pos_col) - F.col("_prev_pos") > maxgap)
                | (F.col("_sign") != F.col("_prev_sign")),
                1,
            ).otherwise(0),
        )
        .withColumn("_seg", F.sum("_brk").over(w_seg))
    )
    return (
        marked.groupBy(chrom_col, "_seg")
        .agg(
            F.min(pos_col).alias("start_pos"),
            F.max(pos_col).alias("end_pos"),
            F.count("*").alias("n_probes"),
            F.avg(stat_col).alias("mean_stat"),
            # every member shares one sign (flips break segments);
            # min() is order-insensitive where first() is not
            F.min("_sign").alias("direction"),
        )
        .filter(F.col("n_probes") >= min_probes)
        .drop("_seg")
    )
