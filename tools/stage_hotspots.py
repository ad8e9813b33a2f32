"""Per-query stage-hotspot report: run each named query once in a
UI-enabled session and print its heaviest stages (executor runTime,
task count) — the fast way to spot serialized stages (1 task doing
seconds of work below an Exchange) and shuffle-heavy stages.

Usage: python tools/stage_hotspots.py [--sf-dir DIR] query [query ...]
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
    ap.add_argument("--top", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.session import get_session

    spark = get_session(
        "hotspots", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"}
    )
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    qs = entrymod.queries()

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return json.load(r)

    for name in args.names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        cache.release_all()

    for name in args.names:
        before = {s["stageId"] for s in stages()}
        t0 = time.time()
        qs[name](spark, args.sf_dir).count()
        wall = time.time() - t0
        cache.release_all()
        new = [s for s in stages() if s["stageId"] not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n{name}: wall {wall:.2f}s, {len(new)} stages")
        for s in new[: args.top]:
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"runTime={s['executorRunTime'] / 1000:6.2f}s "
                f"in={s.get('inputBytes', 0) >> 10}KB "
                f"sr={s.get('shuffleReadBytes', 0) >> 10}KB "
                f"sw={s.get('shuffleWriteBytes', 0) >> 10}KB"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
