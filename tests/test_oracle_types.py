"""Oracle output-type audit regression tests (VERDICT r8 #2).

Pins the class behind every r4-r8 driver hash-red: DuckDB widening
SUM over integers to HUGEINT while Spark emits BIGINT.  The audit tool
(tools/audit_oracle_types.py) must (a) trip on a seeded uncast SUM,
(b) accept the int-family pass-throughs that are historically green,
and (c) certify that the three formerly-red oracles now bind to BIGINT.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from audit_oracle_types import FORBIDDEN_DUCK, audit_one, canon_duck, canon_spark


def _duck_types(sql: str) -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x INTEGER, y BIGINT, s VARCHAR)")
    rel = con.sql(sql)
    return {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}


def test_seeded_uncast_sum_trips():
    """SUM(int) -> HUGEINT must be flagged as forbidden."""
    types = _duck_types("SELECT s, SUM(x) AS n FROM t GROUP BY s")
    assert types["n"] == "HUGEINT"
    assert any(f in canon_duck(types["n"]) for f in FORBIDDEN_DUCK)


def test_cast_sum_is_clean():
    types = _duck_types(
        "SELECT s, CAST(SUM(x) AS BIGINT) AS n FROM t GROUP BY s"
    )
    assert canon_duck(types["n"]) == "INT"
    assert not any(f in canon_duck(types["n"]) for f in FORBIDDEN_DUCK)


def test_int_family_collapses_across_engines():
    """INTEGER (Spark row_number) vs BIGINT (DuckDB ROW_NUMBER) is the
    historically-green pass-through; both canonicalize to INT."""
    from pyspark.sql.types import IntegerType, LongType

    assert canon_duck("INTEGER") == canon_duck("BIGINT") == "INT"
    assert canon_spark(IntegerType()) == canon_spark(LongType()) == "INT"
    # HUGEINT stays OUT of the family
    assert canon_duck("HUGEINT") == "HUGEINT"


def test_audit_one_trips_on_type_mismatch(spark):
    """End-to-end: a Spark twin emitting DOUBLE against a BIGINT oracle
    column must produce a mismatch finding; the fixed twin is clean."""
    con = duckdb.connect()
    con.execute("CREATE VIEW v AS SELECT 1 AS k")

    def bad_twin(s, sf_dir):
        from pyspark.sql import functions as F
        return s.range(1).select(F.lit(1.0).alias("k"))

    def good_twin(s, sf_dir):
        from pyspark.sql import functions as F
        return s.range(1).select(F.lit(1).cast("long").alias("k"))

    sql = "SELECT CAST(1 AS BIGINT) AS k FROM v"
    assert any(
        "type mismatch" in p
        for p in audit_one("seeded", sql, bad_twin, con, spark, "")
    )
    assert audit_one("seeded", sql, good_twin, con, spark, "") == []


def test_audit_one_trips_on_forbidden_hugeint(spark):
    """The exact moderated_f/outlier_mad/corpus_report shape: values
    equal, DuckDB type HUGEINT -> must be flagged even though the Spark
    twin's BIGINT canonicalizes into the int family."""
    con = duckdb.connect()
    con.execute("CREATE VIEW v2 AS SELECT 1 AS x UNION ALL SELECT 2")

    def twin(s, sf_dir):
        from pyspark.sql import functions as F
        return s.range(1).select(F.lit(3).cast("long").alias("n"))

    problems = audit_one(
        "seeded_huge", "SELECT SUM(x) AS n FROM v2", twin, con, spark, ""
    )
    assert any("HUGEINT" in p for p in problems)


@pytest.mark.parametrize(
    "name,col",
    [
        ("outlier_mad", "n_outliers"),
        ("corpus_report", "total_tokens"),
        ("moderated_f", "df2"),
    ],
)
def test_formerly_red_oracles_bind_bigint(name, col):
    """The three r8 hash-reds now emit BIGINT, not HUGEINT (fix r9)."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    rel = con.sql(entrymod.oracle_sql()[name])
    types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    assert types[col] == "BIGINT", types
