"""CCNet pipeline — the composed form of Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data" (the pipeline behind the CC corpora most LLM pretraining sets
descend from). Every stage already exists as a certified standalone
operator; this module owns only the CCNet-ordered composition:

1. **URL dedup** (stage 0, before any content hashing) —
   ``ext.dedup.url_dedup``: canonical-URL min-id winners; rows with a
   NULL url or an empty canonical form are dropped (crawl records
   always carry a URL; the contract is pinned by the standalone
   ``url_dedup`` query).
2. **Line dedup** (the boilerplate scrub) — ``ext.dedup.line_dedup``
   with unicode-normalized keys: every line whose normalized content
   appears in >= ``min_df`` distinct surviving documents is removed;
   documents whose every line was corpus-common (empty rewritten
   text) leave the pipeline here.
3. **Language ID** — ``ext.text.train_lang_weights`` +
   ``lang_id_nb``: the multi-class NB head is fit on the labeled
   subset of the LINE-DEDUPED text (CCNet runs fastText after its
   dedup stages for the same reason: boilerplate is
   language-ambiguous) and every survivor gets an argmax
   ``pred_lang``.
4. **LM perplexity buckets** — ``ext.text.perplexity_buckets`` with
   the interpolated-bigram scorer, partitioned by ``pred_lang``:
   head/middle/tail rank terciles within each predicted language,
   CCNet's final quality partitioning (its KenLM filter), computed on
   the same line-deduped text.

Scale shape: stage 0 is one canonical-URL-keyed shuffle + one
id-keyed keep-join; stage 1 is the line scan's ~4 key-bounded
exchanges (dup-line vocabulary sized, never corpus²); stages 2-4 ride
ONE persisted line-deduped frame (gram explodes are map-side, model
fits are vocabulary/bucket-bounded and broadcast back), and the
tercile window is doc-count sized per language. No stage materializes
anything corpus²; every model table is broadcastable by construction.

Determinism: md5 keys, min-id winners, 6-dp-rounded scores with id
tiebreaks — the whole chain replays in the DuckDB oracle
(``ccnet_pipeline`` in ``__spark_entry__``), end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from methyl_data_pipeline_spark.ext.dedup import line_dedup, url_dedup
from methyl_data_pipeline_spark.ext.text import (
    lang_id_nb,
    perplexity_buckets,
    train_lang_weights,
)


def _cut(df: DataFrame, reliable: bool) -> DataFrame:
    """Materialize ``df`` and TRUNCATE its lineage (the ext.graph
    pattern). A plain ``persist()`` is not enough here: every
    downstream reference re-inlines the cached frame's full logical
    subtree, and this pipeline references its reuse points so many
    times (lang-id fit + score, LM stream + model broadcasts, tercile
    part map, final stats join) that the composed physical plan
    measured 991 exchanges / 288 broadcast joins — ~30 s of pure
    Catalyst analysis before the first task. Checkpointing collapses
    each reference to a block scan. ``reliable=True`` writes to the
    configured checkpoint dir (survives executor loss — required
    under dynamic allocation); the default keeps executor-local
    blocks, the right trade on a stable cluster."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def run_ccnet_pipeline(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    buckets: int = 1024,
    min_df: int = 2,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Run the four CCNet stages over ``docs`` (which must carry
    ``url_col``, ``text_col``, and — on at least some rows — a
    ``label_col`` language label to fit the lang-id head on).

    Returns one row per document that survives stages 0-1:
    ``(id_col, pred_lang, n_lines, n_removed, n_tokens, score,
    bucket)`` where ``n_lines``/``n_removed`` are the line-dedup
    stats, ``score`` is the 6-dp bigram mean log-probability of the
    line-deduped text, and ``bucket`` is the head/middle/tail tercile
    within ``pred_lang``.
    """
    # NO entry-point _spread, on measurement: an interleaved A/B (3
    # runs each, same session) put the corpus repartition at 15.5 s vs
    # 10.1 s without — ``docs`` is referenced by three consumers
    # (url_dedup, the stage-0 keep join, the lang-label join), so the
    # extra exchange is paid per reference while the heavy per-row
    # stages already parallelize past the stage-0/1 shuffles.
    u = url_dedup(docs, url_col=url_col, id_col=id_col)
    keep0 = u.filter(~F.col("is_duplicate")).select(id_col)
    stage0 = docs.join(keep0, id_col, "inner")

    ld = line_dedup(
        stage0, min_df=min_df, text_col=text_col, id_col=id_col, normalize=True
    )
    # reuse point 1: the line-deduped frame feeds the lang-id fit, the
    # lang-id scoring pass, the bigram LM fit+score, and the final
    # stats join — materialized once, lineage cut (see _cut)
    clean = _cut(
        ld.filter(F.trim(F.col(text_col)) != ""), reliable_checkpoint
    )

    labeled = clean.join(docs.select(id_col, label_col), id_col, "left")
    # ONE corpus featurize shared by the lang-id trainer and both
    # scorer branches (VERDICT r14 #3; guide §2.4): unshared, the gram
    # explode + (id, bucket) collapse over the line-deduped text ran
    # THREE times — train_lang_weights' internal featurize plus
    # lang_id_nb's per-class partials and per-doc gram totals. The
    # frame is (_id, _b, _c): corpus-row-bounded and narrow. Passing
    # the all-docs featurize is exact for the trainer (its labels
    # inner join applies the label filter; operator docstring
    # contract). Shared via _cut, NOT cache.track, for the same
    # reason as the pipeline's other reuse points (see _cut): a
    # cache.track'd InMemoryRelation here re-inlines into the trainer
    # broadcast + both scorer branches and measured erratic
    # first-run stalls (12-118 s); the checkpointed share is stable.
    # Interleaved A/B (same session, 3 steady-state pairs, sf0.1):
    # none 10.9/11.1/11.4 s vs shared 9.3/10.0/8.5 s.
    from methyl_data_pipeline_spark.ext.text import _doc_bucket_counts

    dbc = _cut(
        _doc_bucket_counts(clean, text_col, id_col, buckets),
        reliable_checkpoint,
    )
    w = train_lang_weights(
        labeled, lang_col=label_col, text_col=text_col, id_col=id_col,
        buckets=buckets, features=dbc,
    )
    # reuse point 2: the NB fit + score + argmax subtree is consumed by
    # the LM token-stream materialization, the tercile window's
    # broadcast part_col distinct, and the ranked join
    pred = _cut(
        lang_id_nb(
            clean, w, text_col=text_col, id_col=id_col, buckets=buckets,
            features=dbc,
        ).select(id_col, "pred_lang"),
        reliable_checkpoint,
    )

    scored_in = clean.join(pred, id_col, "inner")
    pb = perplexity_buckets(
        scored_in,
        text_col=text_col,
        id_col=id_col,
        part_col="pred_lang",
        model="bigram",
    )
    return pb.join(clean.select(id_col, "n_lines", "n_removed"), id_col).select(
        id_col, "pred_lang", "n_lines", "n_removed", "n_tokens", "score", "bucket"
    )
