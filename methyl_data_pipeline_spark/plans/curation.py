"""End-to-end corpus-curation pipeline — the pretraining-data twin of
``plans.pipeline`` (which mirrors the reference's ``workflow.R``).

Stage chain, the standard order of an LLM-data pipeline:

1. **Quality gate** — C4/Gopher verdict (``ext.text.quality_filter_scan``,
   zero-shuffle scan) drops boilerplate/degenerate docs first so every
   later stage touches less data.
2. **PII redaction** — emails/IPs/phones replaced with typed tokens
   (pure ``regexp_replace`` chain, still scan-side).
3. **Decontamination** — docs sharing any word-5-gram with the
   benchmark set are dropped (broadcast semi-join on shingle hashes).
4. **Exact dedup** — md5-fingerprint min-id winner
   (``ext.dedup.dedup_exact``, one shuffle).
5. **Packing** — survivors laid end-to-end per source shard and cut
   into fixed-token context windows (``ext.pack.pack_sequences``, one
   shuffle per shard window).

Total physical cost: one scan + the decontaminate semi-join + two
keyed shuffles — every filter happens before the first shuffle, so at
100 TB the expensive stages see only surviving documents. The quality
gate is an inline Column filter (no verdict self-join), and the
post-redaction frame is persisted because two consumers (the shingle
explode and the dedup key pass) would otherwise re-run the regex
chain. The whole chain is deterministic (md5 keys, min-id winners,
id-ordered packing) and therefore DuckDB-oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from methyl_data_pipeline_spark import cache
from methyl_data_pipeline_spark.ext.dedup import dedup_exact
from methyl_data_pipeline_spark.ext.pack import pack_sequences
from methyl_data_pipeline_spark.ext.text import (
    PII_PATTERNS,
    decontaminate,
    quality_reject_reasons,
)


def redact_pii_text(col: Column) -> Column:
    """The PII replacement chain of ``ext.text.pii_redact``, exposed as
    a column transform so pipelines can keep the redacted body."""
    red = col
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return red


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    window_tokens: int = 512,
    ngram_n: int = 5,
) -> DataFrame:
    """Run the five-stage curation chain; returns per-doc window
    placement for the surviving corpus: (shard, id, n_tokens, bin_idx,
    bin_offset, spans_boundary)."""
    # quality verdict is a pure Column expression — filter inline, no
    # self-semi-join against a verdict projection (halves the doc scan)
    kept = docs.filter(quality_reject_reasons(text_col=text_col) == F.lit(""))
    # persist post-redaction: `red` feeds BOTH decontaminate's shingle
    # explode and the semi-join's left side; without it the regex chain
    # (quality verdict + PII redaction) re-runs per consumer
    red = cache.track(
        kept.withColumn(text_col, redact_pii_text(F.col(text_col)))
    )
    clean = red.join(
        decontaminate(red, benchmark, text_col=text_col, id_col=id_col, ngram_n=ngram_n)
        .filter(~F.col("contaminated"))
        .select(id_col),
        id_col,
        "left_semi",
    )
    unique = dedup_exact(clean, text_col=text_col, id_col=id_col)
    toks = unique.select(
        F.col(id_col),
        F.col(shard_col),
        F.size(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    return pack_sequences(
        toks, "n_tokens", window_tokens, id_col=id_col, shard_col=shard_col
    )
