"""Heatmap prep (M7): z-score oracle + clustering recovers planted
sample groups."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from methyl_data_pipeline_spark.stats.cluster import cluster_samples, zscore_rows


def test_zscore_rows(spark):
    df = spark.createDataFrame(
        [("cg1", "s1", 1.0), ("cg1", "s2", 2.0), ("cg1", "s3", 3.0),
         ("cg2", "s1", 5.0), ("cg2", "s2", 5.0), ("cg2", "s3", 5.0)],
        ["probe_id", "sample_id", "beta"],
    )
    out = {(r["probe_id"], r["sample_id"]): r["z"] for r in zscore_rows(df).collect()}
    assert abs(out[("cg1", "s1")] + 1.0) < 1e-12
    assert abs(out[("cg1", "s2")]) < 1e-12
    assert abs(out[("cg1", "s3")] - 1.0) < 1e-12
    assert out[("cg2", "s1")] == 0.0  # zero-variance row -> 0, not NaN


def test_cluster_samples_recovers_groups(spark):
    rng = np.random.RandomState(4)
    rows = []
    for p in range(40):
        for s in range(8):
            base = 0.8 if s < 4 else 0.2  # two clean sample groups
            rows.append((f"cg{p:04d}", f"s{s}", float(np.clip(base + rng.normal(0, 0.05), 0, 1))))
    df = spark.createDataFrame(rows, ["probe_id", "sample_id", "beta"])
    out = {r["sample_id"]: r["cluster"] for r in cluster_samples(df, k=2).collect()}
    g1 = {out[f"s{s}"] for s in range(4)}
    g2 = {out[f"s{s}"] for s in range(4, 8)}
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2
