"""End-to-end training-corpus materialization — the corpus twin of
``plans.pipeline.run_methylation_pipeline``.

Composes the curation chain into the artifact a training job actually
reads: curated documents, deterministically split train/val/test,
packed into fixed-token context windows, written as range-clustered
parquet per split. Each stage is an already-certified operator
(``plans.curation.curate``, ``ext.pack.hash_split``,
``operators.scale.layout_sorted_write``); this module only owns the
composition and the output layout.

Scale shape: the curation chain's one regex pass + two keyed shuffles,
the split as a pure projection (no shuffle), and one
``repartitionByRange`` per split for the clustered write. Everything
is deterministic (md5 keys and splits, min-id winners, id-ordered
packing), so re-running the pipeline over the same snapshot
byte-reproduces the output — the property that makes incremental
corpus releases diffable (``ext.dedup.snapshot_diff``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from methyl_data_pipeline_spark.ext.pack import hash_split
from methyl_data_pipeline_spark.operators.scale import layout_sorted_write
from methyl_data_pipeline_spark.plans.curation import curate


@dataclass
class CorpusResult:
    placements: DataFrame          # curated + split + window placement
    split_paths: dict[str, str]    # split name -> parquet dir
    split_counts: dict[str, int]   # split name -> doc count


def run_corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    window_tokens: int = 2048,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    files_per_split: int | None = None,
) -> CorpusResult:
    """Curate → split → pack → (optionally) write.

    Returns the placement frame either way; when ``out_dir`` is given,
    each split lands at ``{out_dir}/{name}`` as parquet range-clustered
    on ``(shard, id)`` so a training reader scanning one shard prunes
    to O(1) files per split (``layout_sorted_write`` footer ranges).
    """
    placed = curate(
        docs,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        shard_col=shard_col,
        window_tokens=window_tokens,
    )
    placed = hash_split(placed, id_col=id_col, weights=weights, names=names)

    split_paths: dict[str, str] = {}
    split_counts: dict[str, int] = {}
    if out_dir is not None:
        # persist once: each split's write and the count aggregate
        # otherwise re-run the whole curation DAG (decontamination
        # joins, dedup, packing windows) per split
        from methyl_data_pipeline_spark import cache

        placed = cache.track(placed)
        for name in names:
            path = os.path.join(out_dir, name)
            part = placed.filter(F.col("split") == name)
            layout_sorted_write(
                part, path, [shard_col, id_col], n_files=files_per_split
            )
            split_paths[name] = path
        # one aggregate over the persisted frame, not a re-read of the
        # freshly written parquet per split
        counts = {
            r["split"]: r["n"]
            for r in placed.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        split_counts = {name: int(counts.get(name, 0)) for name in names}
    return CorpusResult(placed, split_paths, split_counts)
