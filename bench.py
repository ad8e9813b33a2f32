"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE COMPACT JSON line (VERDICT r6 #3: the driver's
stdout capture truncates at ~2000 chars, which left ``parsed: null``
in BENCH_r04-r06 once spread/extended grew the line — the compact
line stays well under the limit):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: median sec, ...}, "runs_per_query": N,
   "sf": ..., "regressions": [...], "failures": [...],
   "details": "BENCH_DETAILS_rNN.json"}

The full record — spreads, the extended query set, per-query deltas
vs the previous round — is written to ``BENCH_DETAILS_rNN.json`` in
the repo root (N = newest driver-recorded round + 1) and committed,
so continuity survives even though the stdout line is trimmed.

Robustness (VERDICT r3 #7): each query is timed ``BENCH_RUNS`` times
(default 5; env-overridable) and reported as the MEDIAN with min/max
spread — single-run harness noise averages out of the median, so
``deltas_vs_prev`` and the REGRESSION_FLAG carry real signal.
Extended queries run ``BENCH_RUNS_EXTENDED`` times (default 3) and —
since round 7 (VERDICT r6 #5) — feed the same regression flag as the
headline set, so a slowdown like r6's 3.6x bloom_decontaminate can no
longer ship silently.

Continuity: the newest BENCH_DETAILS_r*.json (own record, full
medians) or BENCH_r*.json (driver record) provides the previous
round's timings; ``regressions`` lists queries slower than
REGRESSION_FLAG×, queries slower than SPREAD_FLAG× whose min/max
spread is disjoint from the previous round's (VERDICT r7 #4 — a real
mover one tick under the hard flag no longer ships silently), plus
any that crashed. The per-query overlap test is recorded under
``spread_overlap_test`` in the details file.

Self-adjudication (VERDICT r9 #1): three rounds running, flagged
"regressions" on untouched code were session noise (JIT/cache state
accumulated by the 50+ queries timed earlier in the same JVM) that a
fresh-session re-timing cleared — r7 dmr_regions, r8 pricing_summary,
r9 dmr_regions/methyl_pipeline_chain/quantile_normalize. That manual
protocol now lives in the harness: every non-crash flag is re-timed in
ONE fresh subprocess session (``python bench.py --rerun q1,q2``,
BENCH_RERUN_RUNS=5 medians, its own warmup), both numbers land in the
details file under ``adjudication``, and only entries whose FRESH
spread is still disjoint from (and SPREAD_FLAG× above) the previous
round's stay in ``regressions``. A rerun that itself crashes keeps
the original flag — degraded evidence never clears a flag. Disable
with BENCH_ADJUDICATE=0.

Machine calibration: a fresh session cannot clear the OTHER phantom
class — the whole box running slower than on record day (r10 found
every extended query uniformly 1.3-1.6x over the r9 record, with the
r9 TREE timing even slower than the r10 tree side-by-side: pure
machine-day drift). Each bench and each rerun therefore times a fixed
CPU-bound, IO-free calibration job (2B xxhash64 folds across the full
core count) whose median lands in the details file; the adjudicator
scales the previous round's medians/spreads by the calibration ratio
(capped at CAL_RATIO_CAP, and NEVER below 1 — a faster machine must
not excuse a real regression) and returns verdict ``machine_noise``
for flags the uncalibrated test confirms but the calibrated test
clears. A real code regression rides ON TOP of machine drift and
still flags.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "join_full_outer",
    "topk_per_group",
    "meth_variance_topk",
    "meth_moderated_t",
    "bh_adjust",
    "bh_adjust_scalable",
    "text_quality",
    "fingerprint_dedup",
    "minhash_pairs",
    "winnowing",
    "embedding_cosine_topk",
    "ivf_ann_approx",
    "events_windowed",
    "sessionize",
    # Promoted r5 (VERDICT r4 #8): the two most expensive chained plans
    # join the headline set so chain regressions hit the delta
    # machinery, not just the singles. Their medians existed under
    # "extended" in r3/r4 records; _previous_timings merges those in,
    # so deltas_vs_prev stays continuous across the promotion.
    "curation_pipeline",
    "methyl_pipeline_chain",
]

REGRESSION_FLAG = 1.3
# calibration ratios above this cap are not trusted to excuse flags
# (a corrupted/outlier calibration must not whitewash a real 2x+
# regression); the raw ratio is always recorded
CAL_RATIO_CAP = 2.0
# Above this calibration ratio the rerun box is not "drifted", it is
# BROKEN (r14 measured an adjudication rerun at cpu 3.2x / scan 42x
# inside an interference window — classifier_eval spread [7.7, 154] s).
# A "confirmed" verdict from such a box is not evidence: the flag is
# kept but labeled rerun_degraded so nobody reads it as a real
# code-regression confirmation. Clears (still inside the capped
# envelope even on the broken box) remain trustworthy.
DEGRADED_RERUN_RATIO = 2.5
# VERDICT r7 #4: the hard 1.3x flag let a 1.30x dmr_regions drift sail
# through one tick under the line. Below it, a softer test: a query
# moving more than SPREAD_FLAG x whose min/max spread is DISJOINT from
# the previous round's (current min strictly above previous max) is a
# real mover, not harness noise, and flags too.
SPREAD_FLAG = 1.25


def flag_regressions(
    deltas: dict[str, float],
    cur_spread: dict[str, list[float]],
    prev_spread: dict[str, list[float]],
    failures: list[str],
) -> tuple[list[str], dict[str, dict]]:
    """(regressions, overlap_test_record). Pure so the seeded-slowdown
    pytest can trip it without a bench run."""
    overlap_test: dict[str, dict] = {}
    flagged = set(failures)
    for q, r in deltas.items():
        if r > REGRESSION_FLAG:
            flagged.add(q)
            continue
        if r <= SPREAD_FLAG:
            continue
        cur, prev = cur_spread.get(q), prev_spread.get(q)
        if not cur or not prev:
            continue
        disjoint = cur[0] > prev[1]
        overlap_test[q] = {
            "delta": r,
            "cur_spread": cur,
            "prev_spread": prev,
            "disjoint": disjoint,
        }
        if disjoint:
            flagged.add(q)
    return sorted(flagged), overlap_test


def adjudicate_flags(
    flagged: list[str],
    failures: list[str],
    fresh: dict[str, dict] | None,
    prev_medians: dict[str, float],
    prev_spreads: dict[str, list[float]],
    cal_ratio: float | None = None,
) -> tuple[list[str], dict[str, dict]]:
    """Pure confirm/clear decision over the fresh-session re-timings
    (VERDICT r9 #1). ``fresh`` maps query -> {"median", "spread"} from
    the rerun subprocess (None = the rerun itself failed to run).
    ``cal_ratio`` = fresh_calibration / prev_calibration: how much
    slower this machine runs the fixed CPU-bound job than on record
    day. Previous medians/spreads are scaled by min(max(ratio, 1),
    CAL_RATIO_CAP) before the still-regressed test — machine-day drift
    is divided out, a FASTER machine never excuses anything, and an
    implausible ratio is capped.

    A flag is CLEARED only on positive fresh evidence that the query is
    back inside the (calibrated) previous envelope; every degraded path
    — rerun crashed, query missing from the rerun output, no previous
    median — keeps the flag. Crashed queries (``failures``) are never
    adjudicated: a crash is not noise.
    """
    scale = 1.0
    if cal_ratio and cal_ratio > 0:
        scale = min(max(float(cal_ratio), 1.0), CAL_RATIO_CAP)
    record: dict[str, dict] = {}
    confirmed = set(failures)
    for q in flagged:
        if q in confirmed:
            continue
        entry: dict[str, object] = {"prev_median": prev_medians.get(q)}
        f = (fresh or {}).get(q)
        if not fresh:
            entry["verdict"] = "rerun_unavailable"  # keep: no evidence
            confirmed.add(q)
        elif not isinstance(f, dict) or "median" not in f:
            entry["verdict"] = "rerun_failed"  # keep: no evidence
            entry["rerun_error"] = f if isinstance(f, str) else None
            confirmed.add(q)
        elif not prev_medians.get(q):
            entry["verdict"] = "no_prev_median"  # keep: nothing to clear against
            entry.update(fresh_median=f["median"], fresh_spread=f.get("spread"))
            confirmed.add(q)
        else:
            fm, fs = float(f["median"]), f.get("spread") or [f["median"]] * 2
            prev_sp = prev_spreads.get(q)

            def still_regressed(k: float) -> bool:
                # mirrors BOTH original flag arms (ADVICE r10): the
                # hard 1.3x median test applies unconditionally — a
                # single fast fresh run dipping into the previous
                # spread must not clear a >1.3x median; the soft
                # disjoint-spread test additionally confirms slower
                # movers when a previous spread exists
                if fm / (prev_medians[q] * k) > REGRESSION_FLAG:
                    return True
                if prev_sp:
                    return (
                        fs[0] > prev_sp[1] * k
                        and fm / (prev_medians[q] * k) > SPREAD_FLAG
                    )
                return False

            raw_still = still_regressed(1.0)
            cal_still = still_regressed(scale)
            degraded_box = bool(cal_ratio) and float(cal_ratio) > DEGRADED_RERUN_RATIO
            entry.update(
                fresh_median=fm,
                fresh_spread=fs,
                fresh_delta=round(fm / prev_medians[q], 3),
                prev_spread=prev_sp,
                cal_scale=round(scale, 3),
                verdict=(
                    ("rerun_degraded" if degraded_box else "confirmed")
                    if cal_still
                    else ("machine_noise" if raw_still else "noise")
                ),
            )
            if degraded_box:
                entry["rerun_cal_ratio"] = round(float(cal_ratio), 3)
            if cal_still:
                confirmed.add(q)
        record[q] = entry
    return sorted(confirmed), record


def _loadavg() -> float | None:
    """1-minute load average, None where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except Exception:
        return None


def wait_for_quiet(
    threshold: float,
    max_wait_s: float,
    poll_s: float = 20.0,
    _read=_loadavg,
    _sleep=time.sleep,
    _now=time.time,
) -> dict:
    """Never-bench-beside-load guard (VERDICT r13 #6): poll the 1-min
    loadavg until it drops under ``threshold`` or ``max_wait_s``
    elapses, and return the decision record for the details file.
    Called ONLY before the session starts (our own contribution is ~0
    then); mid-bench the box load IS us, so later blocks just snapshot.
    Pure via the injected _read/_sleep/_now so the synthetic-load
    pytest can trip it without a loaded box."""
    start = _now()
    first = _read()
    la = first
    polls = 1
    while la is not None and la > threshold and (_now() - start) < max_wait_s:
        _sleep(poll_s)
        la = _read()
        polls += 1
    waited = round(_now() - start, 1)
    verdict = (
        "unreadable"
        if la is None
        else ("quiet" if la <= threshold else "proceeded_loaded")
    )
    return {
        "threshold": threshold,
        "initial_load": first,
        "final_load": la,
        "waited_s": waited,
        "polls": polls,
        "verdict": verdict,
    }


def _canary(spark) -> float:
    """One fixed ~0.2 s CPU-bound probe (xxhash folds across all
    cores): the instantaneous effective-compute yardstick. Unlike
    loadavg — which this box's interference mode does NOT move
    coherently (r14 measured an 8-minute window of 20-40x query
    slowdown with guest CPU 93% idle, 1 running task, steal ~4%:
    hypervisor-level stalls invisible to every /proc counter) — a
    canary measures the thing the timed queries actually depend on.
    """
    n = spark.sparkContext.defaultParallelism
    t0 = time.time()
    # pmod keeps the sum far from long overflow under ANSI mode
    spark.range(0, 400_000_000, 1, n).selectExpr(
        "sum(pmod(xxhash64(id), 1048576))"
    ).collect()
    return time.time() - t0


def canary_guard(
    spark,
    ref: float,
    deadline: float,
    factor: float = 2.0,
    poll_s: float = 20.0,
    events: list | None = None,
    label: str = "",
) -> bool:
    """Block until the canary runs within ``factor`` x ``ref`` (box
    healthy) or the deadline nears. Returns True if healthy, False if
    it gave up (proceed anyway; the caller records it). Every degraded
    probe is appended to ``events`` for the details record."""
    while True:
        c = _canary(spark)
        if c <= factor * ref:
            return True
        if events is not None:
            events.append(
                {"at": label, "canary_sec": round(c, 3), "ref": round(ref, 3)}
            )
        print(
            f"# canary degraded at {label}: {c:.2f}s vs ref {ref:.2f}s — waiting",
            file=sys.stderr,
        )
        if time.time() + poll_s > deadline - 60:
            return False
        time.sleep(poll_s)


def _calibrate(spark, reps: int = 5) -> float:
    """Median seconds for a fixed CPU-bound, IO-free workload (2B
    xxhash64 folds across the default core count, ~1 s on this box) —
    the machine-speed yardstick recorded beside every bench and rerun
    so round-over-round comparisons can separate machine-day drift
    from code regressions."""
    n = spark.sparkContext.defaultParallelism
    ts = []
    for _ in range(reps + 1):  # first is warmup
        t0 = time.time()
        # pmod keeps the sum far from long overflow under ANSI mode
        spark.range(0, 2_000_000_000, 1, n).selectExpr(
            "sum(pmod(xxhash64(id), 1048576))"
        ).collect()
        ts.append(time.time() - t0)
    ts = sorted(ts[1:])
    return ts[len(ts) // 2]


def _calibrate_scan(spark, sf_dir: str, reps: int = 5) -> float | None:
    """Second yardstick, query-shaped: a small parquet scan + groupBy
    shuffle + collect. The r10 slow phase moved sub-second queries
    1.3-1.6x while the pure-CPU yardstick moved only ~1.08x — that
    slowdown lived in job scheduling / small-scan IO, which this
    yardstick is exposed to and the compute fold is not. The
    adjudicator uses the LARGER of the two ratios (still floored at 1
    and capped at CAL_RATIO_CAP)."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    if not os.path.exists(path):
        return None
    ts = []
    for _ in range(reps + 1):  # first is warmup
        t0 = time.time()
        spark.read.parquet(path).groupBy("l_returnflag").count().collect()
        ts.append(time.time() - t0)
    ts = sorted(ts[1:])
    return ts[len(ts) // 2]


def _rerun_fresh(names: list[str], timeout_s: int | None = None) -> dict | None:
    """Re-time ``names`` in ONE fresh subprocess session (its own JVM,
    its own warmup) and return the rerun record {"rerun": {name:
    {"median", "spread", "rows"}}, "calibration_sec": float} — the
    harness-encoded version of the judge's manual idle-machine
    re-timing protocol. None if the subprocess itself failed."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rerun", ",".join(names)],
            capture_output=True,
            text=True,
            # r14: the caller bounds the rerun by the REMAINING global
            # deadline (the r13 3600s default is only a ceiling) — a
            # long adjudication must never push the whole bench past
            # the driver's budget again (VERDICT r13 #1)
            timeout=(
                timeout_s
                if timeout_s is not None
                else int(os.environ.get("BENCH_RERUN_TIMEOUT", "3600"))
            ),
        )
    except Exception as exc:
        print(f"# adjudication rerun failed to launch: {exc}", file=sys.stderr)
        return None
    for ln in proc.stderr.splitlines():
        print(f"# [rerun] {ln}", file=sys.stderr)
    for ln in reversed(proc.stdout.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except Exception:
                break
    print(
        f"# adjudication rerun produced no parseable line (rc {proc.returncode})",
        file=sys.stderr,
    )
    return None


def rerun_main(names: list[str]) -> None:
    """``bench.py --rerun q1,q2`` entry: fresh session, same warmup
    discipline as the main loop, BENCH_RERUN_RUNS (default 5) timed
    runs per query, ONE JSON line on stdout."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.session import get_session

    spark = get_session("bench-rerun")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(path).limit(1).count()
        except Exception as exc:
            print(f"# rerun target warmup {path} failed: {exc}", file=sys.stderr)
    # warm HARDER than the main loop, not softer: the main session's
    # medians benefit from 50+ queries of accumulated JIT, so a
    # lightly-warmed fresh session is biased UPWARD on sub-second
    # queries and falsely CONFIRMS them (r10: embedding_drift fresh
    # 0.76 s vs 0.55 s properly warmed). Two target-SF executions per
    # query before the timed loop.
    for name in names:
        if name not in qs:
            continue
        try:
            if os.path.isdir(warm_dir) and warm_dir != sf_dir:
                qs[name](spark, warm_dir).count()
            for _ in range(2):
                qs[name](spark, sf_dir).count()
        except Exception as exc:
            print(f"# rerun warmup {name} failed: {exc}", file=sys.stderr)

    cal = _calibrate(spark)
    cal_scan = _calibrate_scan(spark, sf_dir)
    print(
        f"# rerun calibration: cpu {cal:.3f}s scan "
        f"{cal_scan if cal_scan is None else round(cal_scan, 3)}s",
        file=sys.stderr,
    )
    reps = max(1, int(os.environ.get("BENCH_RERUN_RUNS", "5")))
    canary_factor = float(os.environ.get("BENCH_CANARY_FACTOR", "2.0"))
    canary_ref = min(_canary(spark) for _ in range(3))
    rerun_deadline = time.time() + float(
        os.environ.get("BENCH_RERUN_GUARD_BUDGET", "600")
    )
    out: dict[str, object] = {}
    for name in names:
        if name not in qs:
            out[name] = "unknown query"
            continue
        canary_guard(
            spark,
            canary_ref,
            rerun_deadline,
            factor=canary_factor,
            label=f"rerun:{name}",
        )
        try:
            samples: list[float] = []
            n_rows = 0
            for _ in range(reps):
                t0 = time.time()
                n_rows = qs[name](spark, sf_dir).count()
                samples.append(time.time() - t0)
                cache.release_all()
            s = sorted(samples)
            mid = len(s) // 2
            med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2.0
            out[name] = {
                "median": round(med, 3),
                "spread": [round(s[0], 3), round(s[-1], 3)],
                "rows": n_rows,
            }
            print(f"# rerun {name}: median {med:.2f}s over {reps}", file=sys.stderr)
        except Exception as exc:
            out[name] = f"FAILED: {exc}"
            print(f"# rerun {name} FAILED: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "rerun": out,
                "calibration_sec": round(cal, 3),
                "calibration_scan_sec": (
                    round(cal_scan, 3) if cal_scan is not None else None
                ),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


def _previous_spreads(prev_name: str | None) -> tuple[dict[str, list[float]], bool]:
    """(per-query [min, max], readable_ok) from the SAME record the
    medians came from — spreads exist only in our own details files,
    and mixing a stale details round's spreads with a newer driver
    round's medians would run the overlap test across mismatched
    rounds (a real r9-regressed query could hide behind r7's wider
    spread). ``readable_ok`` is False when the details file existed
    but could not be parsed (ADVICE r9: an explicit status flag, not
    an in-band NaN sentinel): the caller records degraded mode in the
    details file so a disabled soft flag is never silent."""
    if not prev_name or not prev_name.startswith("BENCH_DETAILS"):
        return {}, True
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        rec = json.load(open(os.path.join(here, prev_name)))
        merged = dict(rec.get("extended_spread") or {})
        merged.update(rec.get("spread") or {})
        return merged, True
    except Exception as exc:
        # a swallowed load failure would silently DISABLE the
        # spread-disjoint soft flag for the whole round — the exact
        # regression class it exists to catch (ADVICE r8)
        print(
            f"# spread-overlap test disabled: previous details "
            f"{prev_name} unreadable ({exc})",
            file=sys.stderr,
        )
        return {}, False

def _previous_calibration(prev_name: str | None) -> tuple[float | None, float | None]:
    """Record-day machine speed (cpu yardstick, scan yardstick) from
    the same previous details file the medians came from (driver
    BENCH_r records carry no calibration)."""
    if not prev_name or not prev_name.startswith("BENCH_DETAILS"):
        return None, None
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        rec = json.load(open(os.path.join(here, prev_name)))
        cpu = rec.get("calibration_sec")
        scan = rec.get("calibration_scan_sec")
        return (
            float(cpu) if cpu else None,
            float(scan) if scan else None,
        )
    except Exception:
        return None, None


# Timed after HEADLINE and reported under "extended": keeps the
# headline total comparable round-over-round (the continuity signal)
# while still giving the newer operators a recorded sf0.1 number.
EXTENDED = [
    "quantile_normalize",
    "dmr_regions",
    "stream_interval_join",
    "unigram_logprob",
    "pca_gram",
    "quality_filter",
    "segment_dedup",
    "multimodal_features",
    # r5 additions
    "bloom_decontaminate",
    "outlier_mad",
    "hot_ngrams",
    "corpus_report",
    "snapshot_diff",
    # r6 additions
    "bm25_rank",
    "corpus_pipeline",
    "stream_curate",
    # r7 additions
    "length_batches",
    "budget_select",
    "simhash_pairs",
    "exact_substring",
    "split_leakage",
    "temperature_sample",
    "vocab_coverage",
    "funnel",
    "cohort_retention",
    "skew_report",
    "split_contamination",
    "simhash64_pairs",
    "incremental_neardup",
    "threshold_sweep",
    # r9 additions
    "quantize_embeddings",
    "quant_recall",
    "embedding_drift",
    "source_token_cap",
    "containment_pairs",
    # r10 additions
    "semantic_dedup",
    "dsir_select",
    # r11 additions
    "minhash_recall",
    "two_level_recall",
    "bpe_merges",
    "bpe_encode",
    "line_dedup",
    # r12 additions (first benched r13)
    "normalize_text",
    "line_dedup_norm",
    "url_dedup",
    "quality_classifier",
    "classifier_sweep",
    # r13 additions
    "classifier_train",
    "classifier_eval",
    "bigram_logprob",
    # r14 additions
    "image_ahash",
    "image_neardup",
    "audio_neardup",
    "video_neardup",
    "classifier_eval_sum",
    "lang_id_nb",
    "ccnet_pipeline",
]


def _newest_round(pattern: str) -> tuple[int, str] | None:
    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(here, pattern)):
        m = re.search(r"_r(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    return best


def _previous_timings() -> tuple[str | None, dict[str, float]]:
    """Per-query medians from the newest round record: prefer our own
    BENCH_DETAILS_r*.json (full, parseable), fall back to the driver's
    BENCH_r*.json (whose r4-r6 records hold only a truncated tail)."""
    details = _newest_round("BENCH_DETAILS_r*.json")
    driver = _newest_round("BENCH_r*.json")
    if details is not None and (driver is None or details[0] >= driver[0]):
        try:
            rec = json.load(open(details[1]))
            merged = dict(rec.get("extended") or {})
            merged.update(rec.get("queries") or {})
            if merged:
                return os.path.basename(details[1]), merged
        except Exception:
            pass
    best = driver
    if best is None:
        return None, {}
    try:
        rec = json.load(open(best[1]))
        parsed = rec.get("parsed") or {}
        if not parsed.get("queries"):
            # Some driver records leave "parsed" empty and keep only the
            # LAST 2000 chars of output in "tail" — the JSON line is
            # truncated at the front, so scavenge "name": float pairs by
            # regex instead of json.loads. A front-clipped first key has
            # no opening quote and is skipped by the pattern. Medians
            # recovered this way feed only deltas_vs_prev, where a
            # missing query simply yields no delta.
            tail = str(rec.get("tail", ""))
            pair_re = re.compile(r'"([a-z0-9_]+)": ([0-9][0-9.]*)[,}]')
            q_end = tail.find('"spread"')
            queries_seg = tail[: q_end if q_end >= 0 else len(tail)]
            ext_start = tail.find('"extended": {')
            ext_seg = ""
            if ext_start >= 0:
                ext_seg = tail[ext_start : tail.find("}", ext_start) + 1]
            parsed = {
                "queries": {m.group(1): float(m.group(2)) for m in pair_re.finditer(queries_seg)},
                "extended": {m.group(1): float(m.group(2)) for m in pair_re.finditer(ext_seg)},
            }
        # extended medians merged in (headline keys win) so a query
        # promoted extended -> headline keeps its round-over-round delta
        merged = dict(parsed.get("extended") or {})
        merged.update(parsed.get("queries") or {})
        return os.path.basename(best[1]), merged
    except Exception:
        return os.path.basename(best[1]), {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    # Global wall-clock budget (VERDICT r13 #1): everything after the
    # HEADLINE block is diagnostics — extended set, phase split,
    # adjudication — and is truncated once the deadline passes so the
    # process always exits rc=0 well inside the driver's window.
    t_start = time.time()
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_SEC", "2100"))
    # Load guard (VERDICT r13 #6): before the JVM exists our own load
    # contribution is ~0, so the raw 1-min loadavg is the neighbours'.
    load_guard = wait_for_quiet(
        threshold=float(os.environ.get("BENCH_LOAD_THRESHOLD", "8")),
        max_wait_s=float(os.environ.get("BENCH_LOAD_MAX_WAIT", "600")),
    )
    print(f"# load guard: {load_guard}", file=sys.stderr)

    import __spark_entry__ as entrymod
    from methyl_data_pipeline_spark.session import get_session

    spark = get_session("bench")
    # Warmup (JMH-style): run every headline query once at sf0.001.
    # Whole-stage-codegen source depends on the plan, not the data, so
    # this JIT-compiles the exact generated classes the measured runs
    # execute — the timed numbers then reflect steady-state engine
    # throughput at the target SF instead of first-call C2 compilation
    # (which dominated: e.g. minhash 8.7s first call vs 1.6s after).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        # HEADLINE ONLY here. r13 warmed the extended set in this same
        # pre-headline loop (c5d638d) and the first full run of that
        # order (r14) measured the headline block 29.3 s vs the 22.5 s
        # record at EQUAL calibration, with fresh-session adjudication
        # clearing every flag (minhash_pairs in-session 7.0 s vs fresh
        # 2.78 s): ~53 extra warmup queries of JIT/heap/AQE state
        # polluted the headline JVM. The extended warmup now runs
        # AFTER the headline block (below), so headline medians stay
        # comparable round-over-round and extended queries still avoid
        # the cold-first-sample skew (20 s vs 5.5 s, stream_curate).
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:  # keep benching even if warmup trips
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    # Target-dir warmup (VERDICT r8 #4): the sf0.001 loop JIT-compiles
    # the plans but never touches the TARGET files, so per-session
    # sf0.1 init (file listing, parquet footers, FS cache) used to land
    # entirely on the FIRST timed entry — pricing_summary read 1.66x
    # regressed in r8 purely by being first in HEADLINE. One untimed
    # 1-row scan per table moves that cost out of the timed loop.
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(path).limit(1).count()
        except Exception as exc:
            print(f"# target warmup {path} failed: {exc}", file=sys.stderr)

    from methyl_data_pipeline_spark import cache

    calibration = _calibrate(spark)
    calibration_scan = _calibrate_scan(spark, sf_dir)
    print(
        f"# calibration: cpu {calibration:.3f}s"
        f" scan {calibration_scan if calibration_scan is None else round(calibration_scan, 3)}s",
        file=sys.stderr,
    )

    n_runs = max(1, int(os.environ.get("BENCH_RUNS", "5")))
    n_runs_ext = max(1, int(os.environ.get("BENCH_RUNS_EXTENDED", "3")))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2.0

    def _time_query(name: str, reps: int) -> tuple[list[float], int]:
        samples: list[float] = []
        n_rows = 0
        for _ in range(reps):
            t0 = time.time()
            n_rows = qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
            # release operator-tracked caches so one run's intermediates
            # don't sit in storage while the next runs (the shared meth
            # fact-table cache is session-lifetime by design and stays)
            cache.release_all()
        return samples, n_rows

    # Canary reference (best of 3): the healthy-box effective-compute
    # yardstick every guard below compares against. See _canary for
    # why loadavg cannot stand in on this box.
    canary_factor = float(os.environ.get("BENCH_CANARY_FACTOR", "2.0"))
    canary_ref = min(_canary(spark) for _ in range(3))
    print(f"# canary ref: {canary_ref:.3f}s", file=sys.stderr)
    canary_events: list = []
    canary_retries: dict[str, dict] = {}

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    failures: list[str] = []
    for name in HEADLINE:
        samples = None
        for attempt in (0, 1):
            healthy = canary_guard(
                spark,
                canary_ref,
                deadline,
                factor=canary_factor,
                events=canary_events,
                label=f"pre:{name}",
            )
            try:
                samples, n = _time_query(name, n_runs)
            except Exception as exc:
                # a crashed query must not take the whole bench down —
                # the driver needs the JSON line either way; failures
                # are visible in the output for the round record
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
                failures.append(name)
                samples = None
                break
            # a clean pre-guard is not enough: r14 measured an
            # interference window ARRIVING mid-block (minhash_pairs
            # rep at 191 s beside a 2.8 s fresh median). If the box
            # reads degraded right after the runs, the medians are
            # suspect — discard and re-time once the canary recovers.
            post = _canary(spark)
            if post <= canary_factor * canary_ref:
                break
            canary_events.append(
                {
                    "at": f"post:{name}",
                    "canary_sec": round(post, 3),
                    "ref": round(canary_ref, 3),
                }
            )
            if attempt == 0 and healthy and time.time() < deadline - 180:
                canary_retries[name] = {
                    "discarded_median": round(_median(samples), 3)
                }
                print(
                    f"# {name}: canary degraded after the runs "
                    f"({post:.2f}s vs ref {canary_ref:.2f}s) — "
                    f"discarding and re-timing",
                    file=sys.stderr,
                )
                continue
            break
        if samples is None:
            continue
        timings[name] = round(_median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        print(
            f"# {name}: {n} rows, median {timings[name]:.2f}s over {n_runs} "
            f"(spread {spread[name][0]:.2f}-{spread[name][1]:.2f})",
            file=sys.stderr,
        )

    # ---- DRIVER LINE, printed the moment the headline block is done
    # (VERDICT r13 #1). r13's official record came back rc=124 /
    # parsed-null because this line used to print only after ~53
    # extended queries x 3 runs plus a <=3600s adjudication subprocess;
    # everything below this point is diagnostics for the details file
    # and must never gate the driver-facing result again. The
    # regressions in this early line are the headline-only,
    # pre-adjudication flags; the details file carries the full
    # extended + adjudicated picture.
    total = round(sum(timings.values()), 3) if not failures else None
    prev_name, prev = _previous_timings()
    prev_spreads, prev_spreads_ok = _previous_spreads(prev_name)
    head_deltas = {
        q: round(timings[q] / prev[q], 3)
        for q in timings
        if prev.get(q) and prev[q] > 0
    }
    head_regressions, _head_overlap = flag_regressions(
        head_deltas, spread, prev_spreads, failures
    )
    driver_rec = _newest_round("BENCH_r*.json")
    details_name = f"BENCH_DETAILS_r{(driver_rec[0] if driver_rec else 0) + 1:02d}.json"
    out = {
        "metric": "headline_query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": n_runs,
        "sf": sf,
        "regressions": head_regressions,
        "failures": failures,
        "details": details_name,
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1500:  # never exceed the driver's capture window
        slim = dict(out)
        slim["queries"] = {}
        slim["note"] = f"query medians in {details_name}"
        line = json.dumps(slim, separators=(",", ":"))
    print(line, flush=True)

    # Extended warmup, AFTER the headline block (see the headline
    # warmup comment): JIT the extended plans at sf0.001 so their 3
    # timed samples are steady-state, without contaminating the
    # headline JVM.
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in EXTENDED:
            if name not in qs or time.time() > deadline - 30:
                continue
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:
                print(f"# extended warmup {name} failed: {exc}", file=sys.stderr)

    extended: dict[str, float] = {}
    extended_spread: dict[str, list[float]] = {}
    truncated: list[str] = []
    for name in EXTENDED:
        if name not in qs:
            continue
        if time.time() > deadline - 30:
            truncated.append(name)
            continue
        canary_guard(
            spark,
            canary_ref,
            deadline,
            factor=canary_factor,
            events=canary_events,
            label=f"pre:{name}",
        )
        try:
            samples, n = _time_query(name, n_runs_ext)
        except Exception as exc:
            print(f"# extended {name} failed: {exc}", file=sys.stderr)
            continue
        extended[name] = round(_median(samples), 3)
        extended_spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        print(
            f"# {name}: {n} rows, median {extended[name]:.2f}s over {n_runs_ext}",
            file=sys.stderr,
        )

    # stream_curate phase split (VERDICT r6 #9): it is the most
    # expensive query in the suite, so time its Bloom BUILD (benchmark
    # scan + constant-size bit_or collect) and PROBE (quality gate +
    # redaction + per-shingle Bloom test + fingerprint dedup) phases
    # separately — the regression machinery then sees which phase moved.
    try:
        if time.time() > deadline - 30:
            raise RuntimeError("deadline: phase split skipped")
        build_s, probe_s = [], []
        for _ in range(n_runs_ext):
            t0 = time.time()
            words = entrymod._stream_curate_build(spark, sf_dir)
            t1 = time.time()
            entrymod._stream_curate_probe(spark, sf_dir, words).count()
            t2 = time.time()
            build_s.append(t1 - t0)
            probe_s.append(t2 - t1)
            cache.release_all()
        extended["stream_curate_build"] = round(_median(build_s), 3)
        extended["stream_curate_probe"] = round(_median(probe_s), 3)
        print(
            f"# stream_curate phases: build {extended['stream_curate_build']:.2f}s"
            f" probe {extended['stream_curate_probe']:.2f}s",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"# stream_curate phase split failed: {exc}", file=sys.stderr)

    # VERDICT r6 #5: the regression flag covers the EXTENDED set too —
    # a 3.6x extended-query slowdown (r6 bloom_decontaminate) must trip
    # the flag, not ship silently.
    all_timings = dict(extended)
    all_timings.update(timings)
    deltas = {
        q: round(all_timings[q] / prev[q], 3)
        for q in all_timings
        if prev.get(q) and prev[q] > 0
    }
    all_spread = dict(extended_spread)
    all_spread.update(spread)
    # phase-split pseudo-metrics (stream_curate_build/_probe) are
    # diagnostics, not queries: they cannot be rerun standalone and
    # their parent query carries the flag — exclude them from the
    # flag machinery, keep them in deltas_vs_prev for the record
    flag_deltas = {q: d for q, d in deltas.items() if q in qs}
    regressions, overlap_test = flag_regressions(
        flag_deltas, all_spread, prev_spreads, failures
    )

    # Self-adjudication (VERDICT r9 #1): re-time every non-crash flag
    # in one FRESH subprocess session and let the fresh evidence
    # decide. The in-session medians above are polluted by everything
    # timed before them in the same JVM (codegen cache, GC state, FS
    # cache churn); a flag that a fresh session cannot reproduce is
    # session noise, recorded as such, and cleared. The rerun's own
    # calibration vs the record day's separates machine drift from
    # code regressions (verdict "machine_noise").
    adjudication: dict[str, dict] = {}
    # VERDICT r10 #1: record the machine-day calibration ratio EVERY
    # round, not only when flags need adjudicating — the two-yardstick
    # chain is only usable if every record carries it. The rerun path
    # below overwrites with the fresh subprocess's own yardsticks
    # (measured beside the re-timings it adjudicates); if the rerun
    # carries none, adjudication runs UNSCALED (ratio None) — the
    # parent-session ratio is recorded but never scales subprocess
    # timings (ADVICE r11).
    cal_ratio = None
    _prev_cpu, _prev_scan = _previous_calibration(prev_name)
    _session_ratios = [
        r
        for prev_y, cur_y in ((_prev_cpu, calibration), (_prev_scan, calibration_scan))
        if prev_y and cur_y
        for r in [float(cur_y) / prev_y]
    ]
    if _session_ratios:
        cal_ratio = round(max(_session_ratios), 3)
    to_rerun = [q for q in regressions if q not in failures]
    adjudication_skipped = None
    remaining = deadline - time.time()
    if to_rerun and remaining < 180:
        # keep the flags (no evidence) but record WHY no rerun ran —
        # rc=0 + a printed driver line beat a perfectly adjudicated
        # record that never lands (VERDICT r13 #1)
        adjudication_skipped = f"deadline: {round(remaining)}s remaining"
        print(f"# adjudication skipped: {adjudication_skipped}", file=sys.stderr)
        to_rerun = []
    if to_rerun and os.environ.get("BENCH_ADJUDICATE", "1") != "0":
        print(f"# adjudicating flags in fresh session: {to_rerun}", file=sys.stderr)
        # all timing is done — release this session's JVM so the fresh
        # rerun measures alone, not beside a 30 GB idle parent heap
        spark.stop()
        rerun_timeout = min(
            int(os.environ.get("BENCH_RERUN_TIMEOUT", "3600")),
            max(120, int(deadline - time.time() - 30)),
        )
        rerun_rec = _rerun_fresh(to_rerun, timeout_s=rerun_timeout)
        fresh = (rerun_rec or {}).get("rerun")
        prev_cpu, prev_scan = _previous_calibration(prev_name)
        # yardsticks must come from the SAME JVM as the fresh timings
        # they scale (ADVICE r11): if the rerun record carries no
        # calibration, drop the parent-session ratio rather than mix
        # a parent yardstick with subprocess timings.
        fresh_cpu = (rerun_rec or {}).get("calibration_sec")
        fresh_scan = (rerun_rec or {}).get("calibration_scan_sec")
        ratios = []
        if prev_cpu and fresh_cpu:
            ratios.append(float(fresh_cpu) / prev_cpu)
        if prev_scan and fresh_scan:
            ratios.append(float(fresh_scan) / prev_scan)
        adjudicate_ratio = None
        if ratios:
            # the LARGER drift of the two yardsticks: the r10 slow
            # phase was scheduler/IO-shaped (scan 1.3-1.6x, cpu 1.08x)
            adjudicate_ratio = round(max(ratios), 3)
            cal_ratio = adjudicate_ratio
            print(
                f"# machine calibration ratio vs {prev_name}: {cal_ratio}"
                f" (yardsticks: {[round(r, 3) for r in ratios]})",
                file=sys.stderr,
            )
        regressions, adjudication = adjudicate_flags(
            regressions, failures, fresh, prev, prev_spreads, adjudicate_ratio
        )

    # Full record -> committed details file (the driver line already
    # printed right after the headline block).
    details = {
        "metric": "headline_query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs_per_query": n_runs,
        "extended": extended,
        "extended_spread": extended_spread,
        "extended_runs": n_runs_ext,
        "sf": sf,
        "deltas_vs_prev": deltas,
        "regressions": regressions,
        "spread_overlap_test": overlap_test,
        "spread_overlap_status": "ok" if prev_spreads_ok else "prev_unreadable",
        "adjudication": adjudication,
        "calibration_sec": round(calibration, 3),
        "calibration_scan_sec": (
            round(calibration_scan, 3) if calibration_scan is not None else None
        ),
        "calibration_ratio_vs_prev": cal_ratio,
        "failures": failures,
        "prev": prev_name,
        "load_guard": load_guard,
        "canary_ref_sec": round(canary_ref, 3),
        "canary_events": canary_events,
        "canary_retries": canary_retries,
        "deadline_sec": round(deadline - t_start, 1),
        "wall_sec": round(time.time() - t_start, 1),
        "extended_truncated": truncated,
        "adjudication_skipped": adjudication_skipped,
        "headline_regressions_in_driver_line": head_regressions,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    details_path = os.path.join(here, details_name)
    # VERDICT r10 #7: when a round's bench re-records (r10 committed a
    # slow-machine-day record, then the final one), the FINAL record
    # carries a machine-readable pointer to what it replaced, so a
    # future reader diffing committed revisions never grades the
    # superseded session by accident.
    if os.path.exists(details_path):
        try:
            _old = json.load(open(details_path))
            details["supersedes_same_round"] = {
                "value": _old.get("value"),
                "calibration_sec": _old.get("calibration_sec"),
                "calibration_scan_sec": _old.get("calibration_scan_sec"),
                "regressions": _old.get("regressions"),
            }
        except Exception:
            details["supersedes_same_round"] = {"unreadable": True}
    with open(details_path, "w") as fh:
        json.dump(details, fh, indent=1, sort_keys=True)
    print(f"# details written: {details_name}", file=sys.stderr)
    spark.stop()
    # VERDICT r14 #2: the early driver line (printed right after the
    # headline block) is pushed out of the driver's ~2000-char tail
    # capture by the extended/adjudication diagnostics that follow it
    # (r13 AND r14 both came back ``parsed: null``). Re-print the SAME
    # compact line as the LAST stdout line, after the details file is
    # written and the session is stopped, so a tail capture always
    # parses it; the early print stays for captures that read the head.
    print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--rerun":
        rerun_main([n for n in sys.argv[2].split(",") if n])
    else:
        main()
