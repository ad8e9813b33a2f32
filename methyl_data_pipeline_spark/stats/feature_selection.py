"""Variance-based feature selection (reference A1 + W1/O1).

``top10k.py:8-11``: row-wise variance of the wide matrix, sort
descending, head(k). In long form the row-wise variance is a plain
groupBy — partial aggregation map-side, one shuffle on probe_id, and
the top-k plans as TakeOrderedAndProject (per-task heaps, no global
sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from methyl_data_pipeline_spark.operators.topk import top_k_by


def per_probe_variance(meth: DataFrame, value_col: str = "beta") -> DataFrame:
    """Per-probe sample variance (ddof=1 — matches R ``var`` and the
    pandas default used at top10k.py:8). Skips nulls like
    ``var(axis=1, skipna=True)``."""
    return meth.groupBy("probe_id").agg(F.var_samp(F.col(value_col)).alias("variance"))


def top_k_variable_probes(meth: DataFrame, k: int = 10_000, value_col: str = "beta") -> DataFrame:
    """Top-k probes by variance. Reference workflow.R:155-158 (k=10000),
    top10k.py:11 (k=25000). Deterministic under ties via probe_id
    tiebreak."""
    return top_k_by(per_probe_variance(meth, value_col), "variance", k, tiebreak="probe_id")


def select_probes(meth: DataFrame, selected: DataFrame) -> DataFrame:
    """Restrict the fact table to a selected probe set (semi-join) —
    the reference's matrix row-subset `m[sel,]` (workflow.R:158)."""
    return meth.join(selected.select("probe_id"), "probe_id", "left_semi")
