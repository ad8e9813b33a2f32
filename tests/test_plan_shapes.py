"""Physical-plan-shape invariants for the r15 optimization round.

These pin the *mechanism* of the landed optimizations, not the output
(output parity is covered by the oracle batteries and the existing
operator tests): if a Spark upgrade or a refactor re-enables the
pathological plan shape, these fail before the bench does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_curate_batch_twin_gate_stays_above_the_exchange(docs):
    """r15: the quality gate must evaluate POST-exchange via the
    non-materializing pushdown guard — every Filter block that carries
    the gate expression (marker: the 'too_short' reject label) must
    also reference the nondeterministic ``_bar`` guard column. If
    Catalyst ever splits the conjunction or sinks the gate without the
    guard (re-serializing it onto the 1-partition local scan), a
    gate-bearing Filter appears without ``_bar`` and this fails."""
    from methyl_data_pipeline_spark.streaming.events import curate_batch_twin

    plan = _formatted(curate_batch_twin(docs))
    blocks = [b for b in plan.split("\n(") if b.startswith(tuple("0123456789"))]
    gate_blocks = [b for b in blocks if "too_short" in b and ") Filter" in b.splitlines()[0]]
    assert gate_blocks, "quality gate filter not found in the plan"
    for b in gate_blocks:
        assert "_bar" in b, (
            "gate filter lost its pushdown guard — it can sink below "
            "the repartition exchange onto the serial scan:\n" + b[:500]
        )
    # the r14 full-width barrier persist must stay gone
    assert "InMemoryRelation" not in plan


def test_curate_plan_has_exactly_one_narrow_persist(docs):
    """r15: plans.curation.curate keeps ONE InMemoryRelation (the
    narrow survivors-only frame) — the r14 full-width corpus barrier
    persist must not come back (VERDICT r14 #1: bimodal at 32 cores,
    materializes the corpus at scale)."""
    from methyl_data_pipeline_spark.plans.curation import curate

    bench = docs.filter(F.col("doc_id") % 13 == 0)
    corpus = docs.filter(F.col("doc_id") % 13 != 0)
    plan = _formatted(curate(corpus, bench))
    # distinct cached plans, not reference counts: every occurrence of
    # a second InMemoryRelation introduces a second "cachedPlan" id;
    # the narrow red frame may legitimately be referenced many times.
    import re

    cached_cols = set()
    for ln in plan.splitlines():
        if "InMemoryRelation" in ln and "Arguments" not in ln:
            continue
        if ln.strip().startswith("Arguments:") and "StorageLevel" in ln:
            # references to one cache render with re-mapped expression
            # ids (#0L vs #56L) — strip them before deduping
            cached_cols.add(re.sub(r"#\d+", "", ln.strip())[:120])
    assert len(cached_cols) <= 1, (
        f"expected at most one distinct persist in the curate plan, "
        f"saw {len(cached_cols)}: {sorted(cached_cols)}"
    )
    # and the full-width text column must not be what is cached: the
    # persisted frame carries only the normalized projection
    for c in cached_cols:
        assert "_norm" in c, f"persisted frame is not the narrow red frame: {c}"


def test_bpe_encode_word_stream_is_spread(docs):
    """r15: bpe_encode repartitions the corpus before the tokenize
    explode, so the token-stream-sized posexplode + cache fill never
    run on the single-partition local scan."""
    from methyl_data_pipeline_spark.ext.text import bpe_encode

    plan = _formatted(bpe_encode(docs, [("t", "h")]))
    assert "hashpartitioning(doc_id" in plan, (
        "bpe_encode lost the word-stream spread — the tokenize explode "
        "will serialize on a 1-partition scan"
    )
