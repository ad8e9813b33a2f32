"""Median-of-N A/B timer for single queries in one warmed session.

Usage: python tools/ab_time.py [--runs N] [--sf-dir DIR] query [query ...]

Prints per-query median/min/max over N runs (count() action, tracked
caches released between runs) — the quiet-box measurement loop for
optimization-round A/B decisions. Unlike bench.py this times ONLY the
named queries, with no calibration/canary machinery, so an edit->time
iteration is seconds, not minutes.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.session import get_session

    spark = get_session("ab_time")
    qs = entrymod.queries()
    for name in args.names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        cache.release_all()
    for name in args.names:
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            qs[name](spark, args.sf_dir).count()
            samples.append(time.time() - t0)
            cache.release_all()
        print(
            f"{name}: median {statistics.median(samples):.3f}s "
            f"min {min(samples):.3f} max {max(samples):.3f} n={args.runs}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
