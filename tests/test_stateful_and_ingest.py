"""Stateful streaming operator + the reference's entry-point-A ingest
path (main.main(): wide CSVs -> projection -> outer combine -> stats)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from methyl_data_pipeline_spark import model
from methyl_data_pipeline_spark.io.readers import read_beta_csv
from methyl_data_pipeline_spark.operators.joins import combine_runs_wide
from methyl_data_pipeline_spark.operators.qc import health_report
from methyl_data_pipeline_spark.streaming.events import stream_events_from_parquet
from methyl_data_pipeline_spark.streaming.stateful import running_user_stats


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """State must carry across micro-batches: feed two files, check the
    second batch's counts include the first."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    write_batch("b1", [(1, "2024-01-01 00:00:00", 7, 1.0), (2, "2024-01-01 00:01:00", 7, 2.0)])

    stream = stream_events_from_parquet(spark, src)
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_test")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["user_id"]: r for r in spark.sql("SELECT * FROM stateful_test").collect()}
        assert first[7]["n"] == 2
        assert abs(first[7]["mean"] - 1.5) < 1e-12

        write_batch("b2", [(3, "2024-01-01 00:02:00", 7, 3.0), (4, "2024-01-01 00:02:30", 8, 5.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stateful_test").collect()
        latest = {}
        for r in rows:  # memory sink appends update rows; keep max-n per user
            if r["user_id"] not in latest or r["n"] > latest[r["user_id"]]["n"]:
                latest[r["user_id"]] = r
        assert latest[7]["n"] == 3  # state carried: 2 (batch 1) + 1 (batch 2)
        assert abs(latest[7]["mean"] - 2.0) < 1e-12
        assert latest[8]["n"] == 1
    finally:
        q.stop()


def test_streaming_funnel_state_across_batches(spark, tmp_path):
    """Funnel state survives micro-batches (view in batch 1, click in
    batch 2 advances to stage 1) and matches the batch twin when
    batches respect event-time order."""
    from methyl_data_pipeline_spark.streaming.events import funnel_steps
    from methyl_data_pipeline_spark.streaming.stateful import streaming_funnel

    src = str(tmp_path / "fsrc")
    os.makedirs(src)

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    # batch 1: u7 views; u8 purchases (wrong first step -> no advance)
    write_batch([(1, "2024-01-01 00:00:00", 7, "view"),
                 (2, "2024-01-01 00:00:30", 8, "purchase")])
    stream = stream_events_from_parquet(spark, src)
    out = streaming_funnel(stream)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("funnel_test").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_test").collect()
        assert {(r.user_id, r.stage) for r in rows} == {(7, 0)}
        # batch 2: u7 clicks then purchases -> jumps to stage 2
        write_batch([(3, "2024-01-01 00:01:00", 7, "click"),
                     (4, "2024-01-01 00:02:00", 7, "purchase")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_test").collect()
        latest = {}
        for r in rows:
            if r.user_id not in latest or r.stage > latest[r.user_id].stage:
                latest[r.user_id] = r
        assert latest[7].stage == 2 and latest[7].step == "purchase"
        assert 8 not in latest
        # parity with the batch twin over the full event set
        ev = spark.read.parquet(src)
        twin = {r.user_id: r for r in funnel_steps(ev).collect()}
        assert twin[7].t_purchase is not None
        assert twin[7].t_purchase == latest[7].stage_ts
        assert twin[8].t_view is None
    finally:
        q.stop()


def test_streaming_funnel_nullfix_parity(spark, tmp_path):
    """Batch-twin parity on the NULL-events fixture (VERDICT r7 #5):
    NULL user / NULL ts / NULL event_type rows must be dropped
    identically by the stateful state machine and the offline
    conditional-MIN twin — the streaming side must not dedicate a state
    key group to user NULL."""
    import shutil
    import subprocess
    import sys

    from methyl_data_pipeline_spark.streaming.events import funnel_steps
    from methyl_data_pipeline_spark.streaming.stateful import streaming_funnel

    fixture = "/root/repo/.nullfix/events.parquet"
    if not os.path.exists(fixture):
        subprocess.run(
            [sys.executable, "/root/repo/tools/make_null_fixture.py"], check=True
        )
    src = str(tmp_path / "nullev")
    os.makedirs(src)
    shutil.copy(fixture, os.path.join(src, "events.parquet"))

    ev = spark.read.parquet(src)
    assert ev.filter(F.col("user_id").isNull()).count() > 0
    assert ev.filter(F.col("ts").isNull()).count() > 0
    assert ev.filter(F.col("event_type").isNull()).count() > 0

    stream = stream_events_from_parquet(spark, src)
    out = streaming_funnel(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_nullfix")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_nullfix").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # update sink appends; keep the highest stage per user
        if r.user_id not in latest or r.stage > latest[r.user_id].stage:
            latest[r.user_id] = r
    assert None not in latest  # NULL user never gets a state row

    twin = {r.user_id: r for r in funnel_steps(ev).collect()}
    assert None not in twin
    steps = ("view", "click", "purchase")
    # one batch covers everything -> exact parity: the streaming side's
    # highest stage & its timestamp equal the twin's deepest non-NULL
    # t_<step>
    twin_latest = {}
    for uid, r in twin.items():
        stage = -1
        ts = None
        for i, s in enumerate(steps):
            t = r[f"t_{s}"]
            if t is not None:
                stage, ts = i, t
        if stage >= 0:
            twin_latest[uid] = (stage, ts)
    got = {uid: (r.stage, r.stage_ts) for uid, r in latest.items()}
    assert got == twin_latest


def test_entry_point_a_ingest(spark, tmp_path):
    """SURVEY §3.1: reproduce main.main()'s combine semantics from wide
    CSVs — AVG_Beta projection (P1), n-way full outer (J1), NaN-block
    accounting (main.py:239-244 shape)."""
    run1 = pd.DataFrame(
        {
            "TargetID": [f"cg{i:04d}" for i in range(100)],
            "TB1_1.AVG_Beta": [0.1] * 100,
            "TB2_1.AVG_Beta": [0.9] * 100,
            "TB1_1.Intensity": [1234] * 100,  # must be projected away
        }
    )
    run2 = pd.DataFrame(
        {
            "TargetID": [f"cg{i:04d}" for i in range(50, 150)],  # 50% overlap
            "TB3_2.AVG_Beta": [0.5] * 100,
        }
    )
    p1, p2 = str(tmp_path / "run1.csv"), str(tmp_path / "run2.csv")
    run1.to_csv(p1, index=False)
    run2.to_csv(p2, index=False)

    # P1: keep TargetID + AVG_Beta columns only (filter.py:16-19)
    dfs = []
    for p in (p1, p2):
        df = read_beta_csv(spark, p)
        keep = [c for c in df.columns if c == "TargetID" or "AVG_Beta" in c]
        # reference column names contain dots -> backtick-quote
        dfs.append(df.select(*[F.col(f"`{c}`") for c in keep]))
    combined = combine_runs_wide(dfs)

    assert combined.count() == 150  # union of probe sets
    assert set(combined.columns) == {
        "TargetID", "TB1_1.AVG_Beta", "TB2_1.AVG_Beta", "TB3_2.AVG_Beta"
    }
    # NaN-block accounting: 50 probes run1-only + 50 run2-only
    long = model.melt(combined)
    report = health_report(long).collect()[0]
    assert report["n_rows"] == 450
    assert report["n_null_values"] == 50 * 1 + 50 * 2  # missing cells
    # complete-cases via the canonical long form (dotted wide column
    # names break na.drop's column resolution — another reason the
    # engine converts to long immediately after ingest)
    complete = (
        long.groupBy("probe_id")
        .agg(F.count("beta").alias("n"))
        .filter(F.col("n") == 3)
    )
    assert complete.count() == 50  # probes present in both runs


def test_streaming_dedup_gate_across_batches_and_batch_twin(spark, tmp_path):
    """Only a fingerprint's first arrival passes; a later-batch
    duplicate is gated even with a smaller id; one-batch replay equals
    dedup_exact's min-id winners; NULL text drops."""
    from methyl_data_pipeline_spark.ext.dedup import dedup_exact
    from methyl_data_pipeline_spark.streaming.stateful import streaming_dedup_gate

    src = str(tmp_path / "dsrc")
    os.makedirs(src)

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        spark.createDataFrame(pdf.astype({"doc_id": "int64"})).coalesce(
            1
        ).write.mode("append").parquet(src)

    body = "the exact same document body here"
    write_batch([(10, body), (11, "a different document"), (12, body)])
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    out = streaming_dedup_gate(stream)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("dedup_gate_test").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_gate_test").collect()
        # batch 1: min-id winner per body
        assert {r.doc_id for r in rows} == {10, 11}
        # batch 2: smaller-id duplicate arrives late -> gated
        # (first-arrival; the committed winner stands); a novel doc and
        # a NULL-text doc
        write_batch([(5, body), (20, "novel text"), (21, None)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_gate_test").collect()
        assert {r.doc_id for r in rows} == {10, 11, 20}
    finally:
        q.stop()

    # one-batch replay over everything == dedup_exact (min-id winners,
    # NULLs FIRST: a NULL-id row wins its fingerprint in BOTH paths —
    # code review r9)
    src2 = str(tmp_path / "dsrc2")
    extra = spark.createDataFrame(
        [(None, "body only the null-id row carries")],
        "doc_id long, text string",
    )
    all_rows = spark.read.parquet(src).unionByName(extra)
    all_rows.coalesce(1).write.parquet(src2)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src2)
    q2 = (streaming_dedup_gate(stream2).writeStream.outputMode("update")
          .format("memory").queryName("dedup_gate_twin").start())
    try:
        q2.processAllAvailable()
        got = {r.doc_id for r in spark.sql("SELECT * FROM dedup_gate_twin").collect()}
    finally:
        q2.stop()
    twin = {r.doc_id for r in dedup_exact(all_rows).collect()}
    assert got == twin and 5 in got  # one batch: min id 5 wins
    assert None in got  # the NULL-id winner survives in both paths
