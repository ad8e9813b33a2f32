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
