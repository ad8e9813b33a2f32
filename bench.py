"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>,
   "deltas_vs_prev": {name: ratio, ...}, "regressions": [name, ...],
   "prev": "BENCH_rNN.json"}

Continuity: the newest BENCH_r*.json in the repo provides the previous
round's per-query timings; ``deltas_vs_prev`` is this_run/prev per
query and ``regressions`` lists queries slower than REGRESSION_FLAG×.
The harness has real run-to-run variance (r1→r2 drifted 1.27× on
byte-identical code), so single-query flags are a prompt to re-run,
not proof — but they make a real regression visible the round it
lands instead of two rounds later.
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
    "curation_pipeline",
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
        return os.path.basename(best[1]), dict(parsed.get("queries") or {})
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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)
        # release operator-tracked caches so one query's intermediates
        # don't sit in storage while the next runs (the shared meth
        # fact-table cache is session-lifetime by design and stays)
        cache.release_all()

    extended: dict[str, float] = {}
    for name in EXTENDED:
        if name not in qs:
            continue
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
        except Exception as exc:
            print(f"# extended {name} failed: {exc}", file=sys.stderr)
            continue
        extended[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {extended[name]:.2f}s", file=sys.stderr)
        cache.release_all()

    total = round(sum(timings.values()), 3)
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
        "extended": extended,
        "sf": sf,
        "deltas_vs_prev": deltas,
        "regressions": sorted(q for q, r in deltas.items() if r > REGRESSION_FLAG),
        "prev": prev_name,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
