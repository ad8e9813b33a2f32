"""Training-batch assembly operators: sequence packing + stratified
sampling.

Both are pure window programs — deterministic, shuffle-once, and
exactly SQL-expressible (oracle-checked), which is what lets them run
unchanged at 10⁹ documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    window_tokens: int = 2048,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in
    deterministic ``id_col`` order (per shard) and the stream is cut
    every ``window_tokens`` tokens — the standard pretraining packing.
    Emits per-doc placement: ``bin_idx`` (which context window the doc
    STARTS in), ``bin_offset`` (token offset of the doc's start within
    that window), and ``spans_boundary`` (doc crosses into the next
    window and will be split by the chunker).

    One window pass (running sum); with ``shard_col`` the windows are
    per-shard, so no global ordering bottleneck — shards are the unit
    of parallelism exactly as in a real tokenized-corpus layout.
    """
    part = [shard_col] if shard_col else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col).asc())
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    out = df.withColumn("_start", start).select(
        *([shard_col] if shard_col else []),
        id_col,
        token_col,
        (F.col("_start") / window_tokens).cast("long").alias("bin_idx"),
        (F.col("_start") % window_tokens).alias("bin_offset"),
        (
            (F.col("_start") / window_tokens).cast("long")
            != ((F.col("_start") + F.col(token_col) - 1) / window_tokens).cast("long")
        ).alias("spans_boundary"),
    )
    return out


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by md5-hash order of the id — a deterministic,
    seed-free shuffle that is reproducible in any engine (unlike
    ``sample()``'s partition-order-dependent RNG). One shuffle on the
    stratum key; rank via row_number inside each stratum.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
