"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(n·q), JVM-side
(`F.aggregate`/`zip_with` dot products, no UDF). Scale path: LSH
bucketing (random hyperplane signs) so each query only scans its
bucket; recall tunable via number of planes/tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is usually small → broadcast; the corpus side streams
    through a single map stage, and the per-query top-k is a window over
    the (query, corpus) pairs. Exact brute force is the correctness
    baseline; use :func:`lsh_bucketed_topk` at corpus scale.
    """
    # cast float32 storage to float64 before arithmetic so results are
    # reproducible against external double-precision oracles
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + exact rerank
    within bucket.

    Hyperplanes are seeded deterministic pseudo-random vectors generated
    once on the driver (tiny: n_planes × dim floats, broadcast as
    literals). Sign pattern = bucket id; the join key is the bucket, so
    a query compares against ~corpus/2^n_planes vectors instead of all.
    Lower recall near bucket boundaries — the standard ANN trade.
    """
    import numpy as np

    dim = len(vectors.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))

    def bucket(vc: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vc,
                        F.array(*[F.lit(float(x)) for x in planes[p]]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0)).cast("string")
            for p in range(n_planes)
        ]
        return F.concat(*bits)

    vec_d = F.col(vec_col).cast("array<double>")
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        vec_d.alias("_cv"),
        bucket(vec_d).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_d.alias("_qv"),
        bucket(vec_d).alias("_bucket"),
    )
    pairs = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
