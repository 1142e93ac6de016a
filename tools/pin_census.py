"""Plan-shape pin census — generates test_cohort_pins.py dict entries.

For each registered query (or an explicit name list), build its
DataFrame at the given SF dir under the SAME session config the pin
suite asserts with (shuffle_partitions=4), and print a ready-to-paste
pin line: `"name": (exchange_count, ['col,col,...', ...]),` — exact
materialized-Exchange count plus one sorted column-name CSV per
parquet ReadSchema (`''` pins a count-only `struct<>` scan; the pin
parser maps it to the empty set).

Usage:
    python tools/pin_census.py /root/testdata/sf0.001 [NAME ...]

Queries that fail to construct are reported on stderr and omitted —
a pin for a broken query would pin the breakage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    only = sys.argv[2:]

    from conftest import formatted_plan, plan_nodes, read_schema_columns

    import __spark_entry__ as entrymod
    from pyspark_etl_project_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    qs = entrymod.queries()
    names = only if only else sorted(qs)
    bad = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = formatted_plan(df)
            n_ex = plan_nodes(plan).count("Exchange")
            schemas = [",".join(sorted(s)) for s in read_schema_columns(plan)]
        except Exception as e:  # report, don't pin breakage
            bad.append(f"{name}: {type(e).__name__}: {e}")
            continue
        print(f"    \"{name}\": ({n_ex}, {schemas!r}),")
    for b in bad:
        print(f"FAILED {b}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
