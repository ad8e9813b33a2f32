"""PCA over the long fact table (reference M1, SURVEY §2.10).

The reference transposes the wide matrix and runs ``prcomp(t(mvals))``
(``workflow.R:218`` ×6) or sklearn PCA after StandardScaler
(``analysis/pca_analysis.py:37-48``). A pivot to 285k+ columns is not
viable (SURVEY §7.3 #2); instead each sample becomes a dense feature
*vector* over an explicit probe index:

  1. dense probe index: ``row_number`` over the (usually top-k) probe
     set — a dimension-sized window, not a fact-table one;
  2. per-sample vector assembly: ``groupBy(sample).agg(array_sort(
     collect_list(struct(idx, val))))`` → ``array_to_vector`` — one
     shuffle on sample_id, JVM-side throughout;
  3. ``ml.feature.StandardScaler`` (withMean=centering always, withStd
     only for the sklearn-parity variant) + ``ml.feature.PCA``.

Variants (SURVEY M1): A = scaled (sklearn parity), B = centered-only
(prcomp parity), C = top-1000-variance MDS approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assemble_sample_vectors(
    long_df: DataFrame, value_col: str = "mval", key_col: str = "probe_id",
    sample_col: str = "sample_id",
) -> DataFrame:
    """(sample_id, features: Vector) with a consistent probe ordering.

    Probes missing for a sample would silently misalign the dense
    vector, so assembly asserts completeness by construction: rows are
    restricted to probes observed in every sample (semi-join), matching
    the reference's complete-cases precondition for prcomp.
    """
    from pyspark.ml.functions import array_to_vector

    n_samples = long_df.select(sample_col).distinct().count()
    complete = (
        long_df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(value_col).alias("_n"))
        .filter(F.col("_n") == n_samples)
        .select(key_col)
    )
    idx = complete.withColumn(
        "_pidx", F.row_number().over(Window.orderBy(key_col)) - 1
    )
    return (
        long_df.join(idx, key_col)
        .groupBy(sample_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pidx"), F.col(value_col).alias("_v")))
            ).alias("_pairs")
        )
        .withColumn("features", array_to_vector(F.expr("transform(_pairs, p -> p._v)")))
        .drop("_pairs")
    )


def pca_scores(
    long_df: DataFrame,
    k: int = 3,
    value_col: str = "mval",
    scale: bool = False,
    sample_col: str = "sample_id",
) -> tuple[DataFrame, list[float]]:
    """Per-sample PCA scores (PC1..PCk) + explained-variance ratios.

    ``scale=False`` = prcomp parity (center only, workflow.R:218);
    ``scale=True`` = sklearn/StandardScaler parity
    (analysis/pca_analysis.py:37-41).
    """
    from pyspark.ml.feature import PCA as MLPCA, StandardScaler

    vecs = assemble_sample_vectors(long_df, value_col=value_col, sample_col=sample_col)
    scaler = StandardScaler(
        inputCol="features", outputCol="scaled", withMean=True, withStd=scale
    )
    model = scaler.fit(vecs)
    scaled = model.transform(vecs)

    pca = MLPCA(k=k, inputCol="scaled", outputCol="pcs")
    pmodel = pca.fit(scaled)
    scores = pmodel.transform(scaled)

    from pyspark.ml.functions import vector_to_array

    arr = scores.withColumn("_a", vector_to_array("pcs"))
    out = arr.select(
        sample_col, *[F.col("_a")[i].alias(f"PC{i + 1}") for i in range(k)]
    )
    ev = pmodel.explainedVariance.toArray().tolist()
    return out, ev
