"""Whole-registry physical-plan audit.

Asserts, for every contract query in ``__spark_entry__.queries()``:

- no ``CartesianProduct`` (an unbroadcast cross join is never the
  plan you want at 100 TB; broadcast-nested-loop of a 1-row frame is
  allowed and appears as BroadcastNestedLoopJoin),
- no ``BatchEvalPython`` (row-at-a-time Python UDF — the slow path;
  Arrow-batched ``ArrowEvalPython``/``FlatMapGroupsInPandas``/
  ``MapInPandas`` are the sanctioned Python boundaries).

Exit code 1 with a per-query report if anything trips. Run:

    python tools/audit_plans.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

FORBIDDEN = {
    "CartesianProduct": "unbroadcast cross join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from methyl_data_pipeline_spark.session import get_session

    import __spark_entry__ as entry
    from methyl_data_pipeline_spark import cache

    spark = get_session("audit_plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = args.names or list(qs)
    bad: list[tuple[str, str]] = []
    for name in names:
        try:
            plan = (
                qs[name](spark, args.sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # a plan that cannot even build is a failure
            bad.append((name, f"plan build failed: {exc}"))
            continue
        finally:
            cache.release_all()
        for marker, why in FORBIDDEN.items():
            if marker in plan:
                bad.append((name, f"{marker} ({why})"))
    if bad:
        for name, why in bad:
            print(f"FAIL {name}: {why}")
        print(f"{len(bad)} violations in {len(names)} plans")
        return 1
    print(f"OK: {len(names)} plans, no cartesian products, no row-Python UDFs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
