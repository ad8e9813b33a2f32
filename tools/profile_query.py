"""Per-query job/stage profiler (optimization rounds).

Runs named queries once (after warmup) in a UI-enabled session and
reports, per query: wall seconds, number of Spark jobs, number of
stages, and total task time — fetched from the live UI REST API. At
bench scale (sf0.1, tiny files) wall time is dominated by fixed
per-job/per-stage overheads, so job count is the first thing to cut
(the r13 methyl_pipeline_chain fix: 27 jobs of AQE barriers → 3.2 s
median from 4.8 s).

Usage: python tools/profile_query.py [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.session import get_session

    spark = get_session(
        "profile", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    qs = entrymod.queries()

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    # warmup: JIT the plans at sf0.001, touch target files
    warm = "/root/testdata/sf0.001"
    for name in args.names:
        try:
            qs[name](spark, warm).count()
            cache.release_all()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    import glob as _glob
    import os as _os

    for p in sorted(_glob.glob(_os.path.join(args.sf_dir, "*.parquet"))):
        spark.read.parquet(p).limit(1).count()

    out = {}
    for name in args.names:
        best = None
        for _ in range(args.runs):
            before = {j["jobId"] for j in rest("jobs")}
            t0 = time.time()
            n = qs[name](spark, args.sf_dir).count()
            wall = time.time() - t0
            cache.release_all()
            jobs = [j for j in rest("jobs") if j["jobId"] not in before]
            stages = sum(j["numTasks"] > 0 for j in jobs)
            n_stages = sum(len(j["stageIds"]) for j in jobs)
            n_tasks = sum(j["numTasks"] for j in jobs)
            rec = {
                "wall_s": round(wall, 3),
                "rows": n,
                "jobs": len(jobs),
                "stages": n_stages,
                "tasks": n_tasks,
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        out[name] = best
        print(f"{name}: {json.dumps(best)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
