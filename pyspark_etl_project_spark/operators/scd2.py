"""SCD Type-2 merge — the engine's one genuinely custom operator.

Replaces the reference's driver-side row loop
(/root/reference/ETL/CSV_Batch_Processing.py:247-334: toPandas() collect,
then per-row SQLAlchemy INSERT/UPDATE) with a pure-DataFrame rewrite:

    expired   = active mart rows whose key is being updated
                -> ACTIVE_FLAG=0, END_DATE=run_ts
    survivors = all other mart rows, unchanged
    arrivals  = routed INSERT/UPDATE rows
                -> ACTIVE_FLAG=1, START_DATE=run_ts, END_DATE=2099-12-31
    result    = survivors UNION expired UNION arrivals

Invariants (FIXTURES.md §5): exactly one ACTIVE_FLAG=1 row per
(SOURCE_ID, SOURCE_SYSTEM_IDENTIFIER); expired END_DATE equals the
successor's START_DATE (reference CSV:311-324 uses the same "now" for
both).

Scale notes:
- run_ts is a single per-run constant (H9) -> deterministic and identical
  across executors (the reference evaluated datetime.now() driver-side
  once, same semantics).
- The anti/semi split on the update key set is one broadcast join when the
  arrival batch is small (typical incremental load), else a shuffled hash
  join co-partitioned on the natural key.
- With the mart stored partitionBy(SOURCE_ID), a per-source load rewrites
  only that partition (dynamic partition overwrite).
- Surrogate ids: default is unique-but-sparse (monotonically_increasing_id
  + offset) which needs no global sort; ``dense_ids=True`` gives
  autoincrement-faithful dense ids via a global row_number (single-point
  ordering — test/small-data mode only, documented trade-off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_etl_project_spark.config import SCD2_OPEN_END_DATE

KEY = "SOURCE_SYSTEM_IDENTIFIER"


def scd2_merge(mart: DataFrame,
               arrivals: DataFrame,
               run_ts: str,
               key: str = KEY,
               surrogate_col: str = "CSD_ID",
               dense_ids: bool = False,
               broadcast_keys: bool = True) -> DataFrame:
    """Merge routed arrivals (must carry mart columns minus the surrogate,
    plus nothing else) into the SCD2 mart. ``run_ts`` is an ISO timestamp
    string used for both expiry and effective stamps."""
    run_ts_col = F.lit(run_ts).cast("timestamp")
    open_end = F.lit(SCD2_OPEN_END_DATE).cast("timestamp")

    arriving_keys = arrivals.select(key).distinct()
    keys_join = F.broadcast(arriving_keys) if broadcast_keys else arriving_keys

    active = mart.filter(F.col("ACTIVE_FLAG") == 1)
    inactive = mart.filter(F.col("ACTIVE_FLAG") != 1)

    expired = (active.join(keys_join, on=key, how="left_semi")
                     .withColumn("ACTIVE_FLAG", F.lit(0))
                     .withColumn("END_DATE", run_ts_col))
    survivors = active.join(keys_join, on=key, how="left_anti")

    next_id = _surrogate_offset(mart, surrogate_col)
    fresh = (arrivals
             .withColumn("ACTIVE_FLAG", F.lit(1))
             .withColumn("START_DATE", run_ts_col)
             .withColumn("END_DATE", open_end))
    fresh = _assign_surrogates(fresh, surrogate_col, next_id, key, dense_ids)

    cols = mart.columns
    return (inactive.select(cols)
            .unionByName(survivors.select(cols))
            .unionByName(expired.select(cols))
            .unionByName(fresh.select(cols)))


def _surrogate_offset(mart: DataFrame, surrogate_col: str) -> int:
    row = mart.agg(F.max(surrogate_col).alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else 0


def _assign_surrogates(df: DataFrame, surrogate_col: str, offset: int,
                       key: str, dense: bool) -> DataFrame:
    if dense:
        w = Window.orderBy(F.col(key))
        return df.withColumn(surrogate_col,
                             (F.row_number().over(w) + F.lit(offset)).cast("long"))
    return df.withColumn(surrogate_col,
                         (F.monotonically_increasing_id() + F.lit(offset + 1)).cast("long"))
