"""Distributed connected components for duplicate-cluster resolution.

Pair generation (MinHash LSH, SimHash, embedding LSH) yields EDGES;
a dedup pipeline needs CLUSTERS — every document mapped to one
canonical representative, transitively: if A~B and B~C then {A,B,C}
collapse together even when A and C never met in a bucket.

Algorithm: iterative min-label propagation as DataFrame ops — each
round every node takes the min label over itself and its neighbors
(one edge-keyed join + groupBy-min shuffle), converging in
O(graph diameter) rounds with a bounded count() action per round as
the stopping test. Near-dup clusters are shallow (LSH links most
members directly, diameters in the low single digits), so rounds stay
small at any corpus size; for adversarially deep graphs (long chains),
the alternating large-star/small-star contraction of Kiveris et al.
(MapReduce CC, 2014) bounds rounds at O(log n) and slots behind the
same signature.

The converged label IS the component's minimum node id — exactly the
deterministic "keep smallest id" winner rule the exact-dedup path uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from methyl_data_pipeline_spark import cache


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = min node id of the connected component.

    Raises RuntimeError if ``max_iter`` rounds don't converge (a
    diameter that deep means the input is not a near-dup pair list —
    switch to star-contraction rather than silently truncating, which
    would split clusters)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    und = cache.track(und)

    labels = und.select("u").distinct().withColumn("label", F.col("u"))
    labels = cache.track(labels)
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("_nbr", F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new_labels = cache.track(new_labels)
        changed = (
            new_labels.join(
                labels.select("u", F.col("label").alias("_old")), "u"
            )
            .filter(F.col("label") < F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter too large for label propagation; use star contraction"
    )
