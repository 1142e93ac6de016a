"""Dump .explain("formatted") for named queries into plans/<tag>/ files.

Optimization-round deliverable helper: for each query name, builds the
DataFrame at the given SF dir and writes the formatted physical plan to
plans/<round>/<name>_<suffix>.txt (e.g. plans/r17/scd2_merge_before.txt)
so plan-shape claims in OPTIMIZATION_*.md are checkable without Spark.

Usage:
    python tools/dump_plans.py r17 before /root/testdata/sf0.001 NAME...
    python tools/dump_plans.py r17 after  /root/testdata/sf0.001 NAME...

Queries whose plan cannot be built are reported on stderr and skipped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    rnd, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    from pyspark_etl_project_spark.plans import all_queries
    from pyspark_etl_project_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"{name}: not registered", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — report and move on
            print(f"{name}: {str(exc).splitlines()[0][:200]}",
                  file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
