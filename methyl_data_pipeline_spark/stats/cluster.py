"""Heatmap preparation: row z-scoring + sample clustering (reference
M7: ``pheatmap(..., cluster_rows=TRUE, scale="row")`` at
``volcano.R:185-199`` / ``volcano_heatmap.R:31-47``).

The engine produces the tidy inputs a heatmap renderer needs:
- :func:`zscore_rows` — per-probe standardization (scale="row"),
  a groupBy-agg + broadcast-back, no window over the fact table;
- :func:`cluster_samples` — k-group sample clustering via
  ``ml.clustering.BisectingKMeans`` over the per-sample vectors
  (the divisive-hierarchical approximation of hclust; the reference's
  dendrogram itself is a rendering concern on <=|samples| rows).
Rendering stays driver-side (SURVEY M8: out of engine scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zscore_rows(
    meth: DataFrame, value_col: str = "beta", key_col: str = "probe_id",
    out_col: str = "z",
) -> DataFrame:
    """Per-key z-score: (x - mean_key) / sd_key. One shuffle on key;
    the stats rejoin is co-partitioned with the agg."""
    stats = meth.groupBy(key_col).agg(
        F.avg(value_col).alias("_m"), F.stddev_samp(value_col).alias("_sd")
    )
    return (
        meth.join(stats, key_col)
        .withColumn(
            out_col,
            F.when(
                F.col("_sd") > 0, (F.col(value_col) - F.col("_m")) / F.col("_sd")
            ).otherwise(F.lit(0.0)),
        )
        .drop("_m", "_sd")
    )


def cluster_samples(
    meth: DataFrame,
    k: int = 2,
    value_col: str = "beta",
    sample_col: str = "sample_id",
    seed: int = 42,
) -> DataFrame:
    """(sample_id, cluster) assignments via seeded BisectingKMeans over
    per-sample feature vectors (reuses the PCA vector assembly — no
    wide pivot)."""
    from pyspark.ml.clustering import BisectingKMeans

    from methyl_data_pipeline_spark.stats.pca import assemble_sample_vectors

    vecs = assemble_sample_vectors(meth, value_col=value_col, sample_col=sample_col)
    model = BisectingKMeans(k=k, seed=seed, featuresCol="features").fit(vecs)
    return model.transform(vecs).select(
        sample_col, F.col("prediction").alias("cluster")
    )
