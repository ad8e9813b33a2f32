"""Custom stateful streaming operator via ``applyInPandasWithState``.

Engine-native extension (the reference is batch-only): a per-user
running aggregate that survives across micro-batches — the canonical
shape for anomaly detection / rate limiting / incremental QC on an
event stream. State is a single (count, sum, sum_sq) triple per key, so
memory is O(keys), and the operator emits one updated summary row per
key per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, total double, total_sq double"


def running_user_stats(
    stream: DataFrame,
    z_threshold: float = 3.0,
    user_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-user running mean/variance with an anomaly flag
    when the batch mean deviates > ``z_threshold`` sigma from the
    running mean. Update-mode output.

    ``idle_timeout_ms``: evict state for keys idle longer than this
    (production setting so abandoned keys don't leak state). When
    enabled the engine schedules continuous timeout-evaluation batches,
    so ``processAllAvailable()`` never drains — tests and one-shot
    replays should leave it off.

    The output key column is ``user_col`` with the stream's own key
    type (not a hardcoded name/type), and a timed-out invocation
    REMOVES the state and emits nothing — the eviction the knob
    promises (handling ``state.hasTimedOut`` first matters: treating
    the timeout callback as a data batch would re-arm the timer and
    re-emit a stale summary forever)."""
    key_type = dict(stream.dtypes)[user_col]
    output_schema = (
        f"`{user_col}` {key_type}, n long, mean double, m2 double, "
        "is_anomalous boolean"
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n0, s0, ss0 = (state.get if state.exists else (0, 0.0, 0.0))
        batch_n, batch_s, batch_ss = 0, 0.0, 0.0
        for pdf in pdfs:
            v = pdf[value_col].astype(float)
            batch_n += int(v.count())
            batch_s += float(v.sum())
            batch_ss += float((v * v).sum())
        n = n0 + batch_n
        s = s0 + batch_s
        ss = ss0 + batch_ss
        state.update((n, s, ss))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        mean = s / n if n else 0.0
        m2 = ss / n - mean * mean if n else 0.0
        anomalous = False
        if n0 > 1 and batch_n > 0:
            prev_mean = s0 / n0
            prev_var = max(ss0 / n0 - prev_mean * prev_mean, 1e-12)
            batch_mean = batch_s / batch_n
            anomalous = abs(batch_mean - prev_mean) > z_threshold * (prev_var ** 0.5)
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n": [n],
                "mean": [mean],
                "m2": [m2],
                "is_anomalous": [anomalous],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


FUNNEL_STATE_SCHEMA = "stage long, stage_us long"


def streaming_funnel(
    stream: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of :func:`streaming.events.funnel_steps`: a
    per-user funnel state machine that survives micro-batches. State
    is (highest completed stage index, its event time) — O(1) per
    user. Each batch's events are processed in event-time order and
    the machine advances when the NEXT step's event arrives strictly
    after the current stage's time; an advance emits one update row
    ``(user, stage, step, stage_ts)``.

    Exactness contract: processed over batches that respect event-time
    order (or one batch covering everything), the greedy in-order scan
    equals the batch twin's nested conditional MINs exactly — the
    first qualifying event of the next step IS that nested minimum. A
    late event older than the committed stage time cannot rewind the
    machine (first-arrival semantics, same tradeoff as stream_curate's
    first-arrival dedup); the batch twin is the offline ground truth.

    State time is an exact INTEGER microsecond count, not float
    seconds: sources deliver nanosecond timestamps (the testdata
    does), float64 seconds resolve only ~100 ns at current epochs, and
    Arrow rejects the lossy ns→us cast a float-round-tripped emit
    produces. Microsecond truncation also matches the batch twin's
    micros-typed ts column, so the strict `>` comparisons agree.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs >= 2 steps")
    # NULL users are dropped BEFORE the state grouping — the batch twin
    # filters them (not a funnel subject), and without this the state
    # store would dedicate a key group to user NULL and emit rows the
    # twin never produces (pinned by the .nullfix parity pytest).
    # NULL ts/type rows drop inside update() via dropna.
    stream = stream.filter(F.col(user_col).isNotNull())
    key_type = dict(stream.dtypes)[user_col]
    out_schema = (
        f"`{user_col}` {key_type}, stage long, step string, stage_ts timestamp"
    )
    step_list = list(steps)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        stage, stage_us = (state.get if state.exists else (-1, -(2 ** 62)))
        batches = [pdf[[ts_col, type_col]].dropna() for pdf in pdfs]
        ev = (
            pd.concat(batches, ignore_index=True)
            if batches
            else pd.DataFrame(columns=[ts_col, type_col])
        )
        ev = ev.sort_values(ts_col)
        advanced = False
        for ts, et in zip(ev[ts_col], ev[type_col]):
            nxt = stage + 1
            if nxt >= len(step_list):
                break
            t = int(pd.Timestamp(ts).value) // 1000  # exact micros
            if et == step_list[nxt] and t > stage_us:
                stage, stage_us = nxt, t
                advanced = True
        if advanced:
            state.update((stage, stage_us))
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "stage": [stage],
                    "step": [step_list[stage]],
                    "stage_ts": [pd.Timestamp(stage_us * 1000)],
                }
            )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_STATE_SCHEMA = "seen tinyint"


def streaming_dedup_gate(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact-dedup gate — the stateful twin of
    :func:`ext.dedup.dedup_exact` for a continuously ingested document
    stream: per content fingerprint (the SAME ``md5_long(
    normalize_label(text))`` as the batch family, so the two paths
    agree on what "same document" means), only the first arrival
    passes; every later duplicate is silently gated. State is one
    byte per distinct body — O(distinct corpus), the same ledger the
    batch :func:`ext.dedup.incremental_dedup` keeps in a table.

    Exactness contract: within a batch the winner is the MIN id of the
    fingerprint's rows UNDER dedup_exact's exact ordering — ascending
    with NULLs FIRST, so a NULL-id row wins its fingerprint just as it
    does in the batch twin's ``row_number`` — and a single batch
    covering everything therefore equals the batch twin exactly;
    across batches it is first-arrival (an earlier-id duplicate
    arriving in a later micro-batch cannot unseat a committed winner —
    the same tradeoff as stream_curate, with the batch twin as offline
    ground truth). NULL-text docs drop (no fingerprint), matching the
    pinned batch contract.

    No state timeout on purpose: evicting a dedup ledger entry silently
    re-admits its duplicates. A bounded-memory deployment should
    instead periodically compact the stream into the batch
    ``incremental_dedup`` ledger and restart the gate.
    """
    from methyl_data_pipeline_spark.ext.text import md5_long
    from methyl_data_pipeline_spark.functions.scalar import normalize_label

    keyed = stream.filter(F.col(text_col).isNotNull()).withColumn(
        "_fp", md5_long(normalize_label(F.col(text_col)))
    )
    id_type = dict(stream.dtypes)[id_col]
    out_schema = f"_fp long, `{id_col}` {id_type}"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # unreachable under NoTimeout; kept for
            state.remove()     # safety if a caller re-wires the conf
            return
        if state.exists:
            return  # every row in this batch is a known duplicate
        winner = None
        saw_null = False
        saw_row = False
        for pdf in pdfs:
            if len(pdf):
                saw_row = True
            ids = pdf[id_col]
            if ids.isna().any():
                saw_null = True
            ids = ids.dropna()
            if len(ids):
                m = ids.min()
                winner = m if winner is None else min(winner, m)
        if not saw_row:
            return
        state.update((1,))
        # NULLs-first winner ordering, matching dedup_exact's
        # row_number(orderBy id asc): a NULL-id row BEATS every
        # non-null id, so the one-batch-replay equality holds verbatim
        yield pd.DataFrame(
            {"_fp": [key[0]], id_col: [None if saw_null else winner]}
        )

    return keyed.groupBy("_fp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
