"""Registry invariants for the driver contract (__spark_entry__.py).

The driver's correctness harness records only the FIRST 50 ``queries()``
entries — a rotation mistake that leaves a window slot without an
``oracle_sql()`` twin silently downgrades that query to a rows-only
check. Pure-Python guards, no Spark session.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


# r6: the six rows-only queries rotate INTO the window for their first
# driver rows+schema certification (VERDICT r5 #2). Each is anchored by
# an oracle-checked deterministic-prefix/certificate query (see
# README); no OTHER rows-only query may occupy a window slot.
ROWS_ONLY_IN_WINDOW = {
    "pca_scores",
    "mds_coords",
    "bmiq_normalize",
    "combat_covariates",
    "ivf_ann_approx",
    "pipeline_end_to_end",
}


def test_driver_window_is_oracle_backed_or_certified_rows_only():
    q = list(entry.queries())
    o = entry.oracle_sql()
    assert len(q) >= 50
    missing = [
        k for k in q[:50] if k not in o and k not in ROWS_ONLY_IN_WINDOW
    ]
    assert not missing, f"window slots without oracle: {missing}"


def test_every_oracle_has_a_query():
    q = set(entry.queries())
    orphans = [k for k in entry.oracle_sql() if k not in q]
    assert not orphans, f"oracle entries without a query: {orphans}"


def test_no_duplicate_keys_in_source():
    import collections
    import re

    src = open(entry.__file__).read()
    keys = re.findall(r'^        "([a-z_0-9]+)": q_', src, re.M)
    dups = [k for k, c in collections.Counter(keys).items() if c > 1]
    assert not dups, f"duplicate registry keys (dict silently drops): {dups}"


def test_rounding_normalizer_applied():
    """Every ROUND( in every oracle must carry the -0.0 folding
    suffix; a raw ROUND hashes DuckDB's -0.0 differently from Spark."""
    for name, sql in entry.oracle_sql().items():
        i = 0
        while True:
            j = sql.find("ROUND(", i)
            if j < 0:
                break
            depth, k = 0, j + 5
            while True:
                ch = sql[k]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            assert sql[k + 1 : k + 7] == " + 0.0", (
                f"{name}: ROUND at offset {j} missing normalization"
            )
            i = k + 1


def test_integer_encoded_queries_partitioning_invariant(spark):
    """The driver's only historical hash misses were summation-order
    ulps crossing a float ROUND boundary in a different environment.
    The three refitted queries emit scaled integers; this pins the
    mechanism: outputs must be IDENTICAL (not just close) under 1-
    vs 64-partition execution, where summation order genuinely differs,
    and every non-string output column must be integral."""
    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    for name in ("outlier_mad", "corpus_report", "moderated_f", "bm25_rank"):
        frames = []
        for parts in (1, 64):
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                df = qs[name](spark, sf)
                rows = sorted(tuple(r) for r in df.collect())
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
            for f in df.schema.fields:
                assert f.dataType.typeName() in (
                    "string", "long", "integer", "boolean"
                ), f"{name}.{f.name} is {f.dataType.typeName()} — float in a hash-compared column"
            frames.append(rows)
        assert frames[0] == frames[1], f"{name} not partitioning-invariant"


def test_float_queries_ulp_insensitive(spark):
    """VERDICT r6 #7: the grid-align rounds must absorb libm/FMA-level
    environment differences, not merely survive re-partitioning. A
    ±1e-13 relative perturbation of the float inputs (mval before its
    9dp round, events.value) models a different libm producing
    ulp-shifted doubles — the emitted integers must be IDENTICAL."""
    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    for name in ("moderated_f", "outlier_mad"):
        results = []
        for eps in (0.0, 1e-13, -1e-13):
            entry._ULP_EPS = eps
            try:
                rows = sorted(tuple(r) for r in qs[name](spark, sf).collect())
            finally:
                entry._ULP_EPS = 0.0
            results.append(rows)
        assert results[0] == results[1] == results[2], (
            f"{name} output moved under a 1e-13 input perturbation"
        )


def test_meth_cache_is_bounded_lru(spark):
    """VERDICT r9 #5: the session-lifetime meth cache must not grow
    monotonically across a multi-fixture session — beyond the LRU cap
    the oldest entry is unpersisted and dropped."""
    entry.clear_meth_cache()
    assert len(entry._METH_CACHE) == 0
    # distinct path spellings are distinct cache keys over the same
    # physical fixture — a cheap stand-in for N fixture dirs
    dirs = [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.001/",
        "/root/testdata/sf0.001//",
    ]
    frames = [entry._meth(spark, d) for d in dirs]
    assert len(entry._METH_CACHE) == entry._METH_CACHE_CAP
    # the first (least recently used) entry was evicted AND unpersisted
    assert not frames[0].storageLevel.useMemory
    assert frames[1].storageLevel.useMemory
    assert frames[2].storageLevel.useMemory
    # re-touching a live entry refreshes recency: inserting a 4th dir
    # then evicts dirs[2], not dirs[1]
    assert entry._meth(spark, dirs[1]) is frames[1]
    entry._meth(spark, "/root/testdata/sf0.001///")
    assert not frames[2].storageLevel.useMemory
    assert frames[1].storageLevel.useMemory
    # the explicit reset hook empties storage entirely
    entry.clear_meth_cache()
    assert len(entry._METH_CACHE) == 0
    assert all(not f.storageLevel.useMemory for f in frames)
