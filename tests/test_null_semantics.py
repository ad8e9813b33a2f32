"""NULL-text / NULL-lang semantics across the text/dedup operators.

VERDICT r6 found two latent cross-engine divergences in corpus_report
(F.size(NULL) = -1 summed into total_tokens; NULLS FIRST tie-break)
that all-clean fixtures could never catch. These tests pin the agreed
NULL semantics — NULL text contributes nothing, gets an explicit
verdict, or propagates NULL, exactly as a NULL-propagating SQL engine
behaves — on a fixture that actually contains NULL text, NULL lang,
empty text, and whitespace-only text.

The full empirical gate is tools/make_null_fixture.py +
tools/check_oracle.py --sf-dir .nullfix (108/108 as of round 7); these
tests keep the core invariants cheap enough for every pytest run.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def null_docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the quick brown fox jumps over the lazy dog today",
                None,
                "",
                "   ",
                "the quick brown fox jumps over the lazy dog today",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            ],
            "lang": ["en", None, "en", "de", "en", None],
            "source": ["a", "a", "a", "b", "b", "b"],
            "n_chars": [49, 0, 0, 3, 49, 56],
        }
    )
    return spark.createDataFrame(pdf)


def test_nullsafe_token_count(spark, null_docs):
    from methyl_data_pipeline_spark.ext.text import n_words_nullsafe

    rows = null_docs.select(
        "doc_id", n_words_nullsafe("text").alias("n")
    ).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r["n"] for r in rows}
    assert by_id[2] is None  # NULL text -> NULL, never -1
    assert by_id[3] == 1  # '' splits to [''] on both engines
    assert by_id[1] == 10


def test_shingles_null_text_yields_null_not_empty_string(spark, null_docs):
    from methyl_data_pipeline_spark.ext.dedup import shingles

    rows = null_docs.select(
        "doc_id", shingles("text", 3).alias("sh")
    ).collect()
    by_id = {r["doc_id"]: r["sh"] for r in rows}
    assert by_id[2] is None  # NOT [""] — a NULL doc must not minhash
    assert by_id[3] == [""]  # empty text still yields its one shingle


def test_corpus_report_null_text_and_lang(spark, null_docs):
    from methyl_data_pipeline_spark.ext.text import corpus_report

    rows = corpus_report(null_docs).orderBy("source").collect()
    a = next(r for r in rows if r["source"] == "a")
    # NULL text contributes NOTHING to the token sum (doc 1: 10 toks,
    # doc 3 '': 1 tok); with size(NULL)=-1 leakage this would be 10
    assert a["total_tokens"] == 11
    # shard b: langs {de, NULL}; 'de' (1 doc) ties NULL-lang (1 doc) —
    # NULLS LAST elects the non-NULL language on both engines
    b = next(r for r in rows if r["source"] == "b")
    assert b["top_lang"] == "de"


def test_quality_filter_null_text_verdict(spark, null_docs):
    from methyl_data_pipeline_spark.ext.text import (
        quality_filter,
        quality_filter_scan,
    )

    for fn in (quality_filter, quality_filter_scan):
        rows = fn(null_docs).orderBy("doc_id").collect()
        assert len(rows) == 6  # NULL doc still receives a verdict row
        nulldoc = next(r for r in rows if r["doc_id"] == 2)
        assert nulldoc["reject_reasons"] == "null_text"
        assert nulldoc["keep"] is False
        assert nulldoc["n_words"] is None


def test_quality_twins_agree_on_null_fixture(spark, null_docs):
    from methyl_data_pipeline_spark.ext.text import (
        quality_filter,
        quality_filter_scan,
    )

    a = sorted(map(tuple, quality_filter(null_docs).collect()))
    b = sorted(map(tuple, quality_filter_scan(null_docs).collect()))
    assert a == b


def test_minhash_null_text_no_signature_no_pairs(spark, null_docs):
    from methyl_data_pipeline_spark.ext.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(null_docs).collect()
    by_id = {r["doc_id"]: r["mh_0"] for r in sigs}
    assert by_id[2] is None
    pairs = minhash_candidate_pairs(
        null_docs.union(
            null_docs.withColumn("doc_id", F.col("doc_id") + 100)
        )
    ).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert 2 not in ids and 102 not in ids  # NULL docs never pair


def test_dedup_keep_best_null_key_family_survives(spark, null_docs):
    from methyl_data_pipeline_spark.ext.dedup import dedup_keep_best

    keyed = null_docs.withColumn(
        "_key",
        F.when(
            F.col("text").isNotNull() & (F.col("doc_id") != 6),
            F.substring("text", 1, 9),
        ),
    )
    out = dedup_keep_best(keyed, "_key", "n_chars").collect()
    # docs 2 and 6 share the NULL key — ONE winner must survive the
    # null-safe semi-join (n_chars 0 vs 56 -> doc 6 wins); a plain
    # equi-join would drop the whole NULL family
    null_family = [r["doc_id"] for r in out if r["_key"] is None]
    assert null_family == [6]


def test_snapshot_diff_null_body_unchanged(spark, null_docs):
    from methyl_data_pipeline_spark.ext.dedup import snapshot_diff

    out = snapshot_diff(null_docs, null_docs).collect()
    assert all(r["status"] == "unchanged" for r in out)


def test_simhash_winnowing_drop_null_docs(spark, null_docs):
    from methyl_data_pipeline_spark.ext.dedup import simhash
    from methyl_data_pipeline_spark.ext.text import winnow_fingerprints

    assert 2 not in {r["doc_id"] for r in simhash(null_docs).collect()}
    assert 2 not in {
        r["doc_id"] for r in winnow_fingerprints(null_docs).collect()
    }


def test_language_id_ngram_null_text_und_zero(spark, null_docs):
    from methyl_data_pipeline_spark.ext.text import language_id_ngram

    rows = language_id_ngram(null_docs).collect()
    r = next(r for r in rows if r["doc_id"] == 2)
    assert r["lang_pred_ngram"] == "und"
    assert r["ngram_hits"] == 0
