"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: median sec, ...}, "spread": {name: [min, max]},
   "runs_per_query": N, "sf": <scale factor>,
   "deltas_vs_prev": {name: ratio, ...}, "regressions": [name, ...],
   "prev": "BENCH_rNN.json"}

Robustness (VERDICT r3 #7): each query is timed ``BENCH_RUNS`` times
(default 5; env-overridable) and reported as the MEDIAN with min/max
spread — the ±25% single-run harness noise that produced r2's phantom
regression flag averages out of the median, so ``deltas_vs_prev`` and
the REGRESSION_FLAG now compare medians and carry real signal.
Extended queries run ``BENCH_RUNS_EXTENDED`` times (default 3 — they
are the slow tail and feed no round-over-round flag).

Continuity: the newest BENCH_r*.json in the repo provides the previous
round's per-query timings; ``deltas_vs_prev`` is this_median/prev per
query and ``regressions`` lists queries slower than REGRESSION_FLAG×.
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
]


def _previous_timings() -> tuple[str | None, dict[str, float]]:
    """Per-query timings from the newest driver-recorded BENCH_r*.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
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
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:  # keep benching even if warmup trips
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    from methyl_data_pipeline_spark import cache

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

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    failures: list[str] = []
    for name in HEADLINE:
        try:
            samples, n = _time_query(name, n_runs)
        except Exception as exc:
            # a crashed query must not take the whole bench down — the
            # driver needs the JSON line either way; failures are
            # visible in the output for the round record
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            failures.append(name)
            continue
        timings[name] = round(_median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        print(
            f"# {name}: {n} rows, median {timings[name]:.2f}s over {n_runs} "
            f"(spread {spread[name][0]:.2f}-{spread[name][1]:.2f})",
            file=sys.stderr,
        )

    extended: dict[str, float] = {}
    extended_spread: dict[str, list[float]] = {}
    for name in EXTENDED:
        if name not in qs:
            continue
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

    # A crashed headline query must read as a failure, not a speedup:
    # with any failure the total is meaningless (it sums only the
    # survivors), so null it out and flag the failed names as
    # regressions alongside the slow ones.
    total = round(sum(timings.values()), 3) if not failures else None
    prev_name, prev = _previous_timings()
    deltas = {
        q: round(timings[q] / prev[q], 3)
        for q in timings
        if prev.get(q) and prev[q] > 0
    }
    out = {
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
        "regressions": sorted(
            set(q for q, r in deltas.items() if r > REGRESSION_FLAG) | set(failures)
        ),
        "failures": failures,
        "prev": prev_name,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
