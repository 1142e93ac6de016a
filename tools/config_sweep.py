"""Partition-layout independence sweep: every registered query must
produce value-identical results under a perturbed physical config.

The DuckDB oracle compares Spark vs a second engine at ONE Spark
config, so it cannot see partition-dependent nondeterminism — the
tie-break / collect-order / spark_partition_id class of bugs where a
query is "correct" at 4 shuffle partitions and different at 7. This
sweep runs each query twice in the same session:

  A: the session defaults the oracle gate uses
  B: spark.sql.shuffle.partitions=7, adaptive execution OFF

and compares the order-insensitive value digest (check_oracle's
frame_digest). The engine-wide rule is deterministic tiebreaks
everywhere, so the expected mismatch set is EMPTY; any hit is either a
real determinism bug or an undocumented tie.

Usage: python tools/config_sweep.py [SF_DIR] [NAME ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TOOL_DIR = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_TOOL_DIR, "check_oracle.py"))
check_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracle)
frame_digest = check_oracle.frame_digest

PERTURBED = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.enabled": "false",
}


def _digest(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    return frame_digest(df.columns, df.collect())


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark_etl_project_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    spark = get_spark("config_sweep")
    qs = entrymod.queries()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    defaults = {k: spark.conf.get(k) for k in PERTURBED}
    failures, errors = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            for k, v in defaults.items():
                spark.conf.set(k, v)
            a = _digest(fn, spark, sf_dir)
            for k, v in PERTURBED.items():
                spark.conf.set(k, v)
            b = _digest(fn, spark, sf_dir)
        except Exception as e:
            errors.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
            continue
        finally:
            for k, v in defaults.items():
                spark.conf.set(k, v)
        status = "ok" if a == b else "MISMATCH"
        if a != b:
            failures.append(name)
        print(f"{status} {name} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(failures)} mismatches, {len(errors)} errors")
    if failures:
        print("mismatched:", sorted(failures))
    return 1 if (failures or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
