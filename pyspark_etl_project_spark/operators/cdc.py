"""Change-data-capture classification by hash compare.

Reference C1-C3 + B5 (SURVEY.md §2.C): new batch LEFT JOIN historic
active-mart slice on the natural key; route
  - no historic match            -> INSERT
  - match, hash equal            -> DUPLICATE (dropped downstream)
  - match, hash different        -> UPDATE
(/root/reference/ETL/CSV_Batch_Processing.py:150-162, JSON:171-185,
XML:191-204.)

Scale notes:
- The historic side is an ACTIVE_FLAG=1, single-source slice of the mart:
  projected to 3 columns and filtered before the join, so Catalyst reads
  only those columns and (with the mart partitioned by SOURCE_ID) only one
  partition. At 100 TB the slice is still ~the live-key set of one source;
  we broadcast when small, else it's a plain shuffled hash join on the
  natural key — co-partitioned with the downstream SCD2 merge which groups
  on the same key.
- The reference joins then filters; left_anti/left_semi would be two scans
  of the batch. The single left join + when() is one shuffle and one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUTER_COL = "ROUTER_GROUP"
INSERT, UPDATE, DUPLICATE = "INSERT", "UPDATE", "DUPLICATE"


def cdc_classify(batch: DataFrame,
                 historic: DataFrame,
                 key: str = "SOURCE_SYSTEM_IDENTIFIER",
                 hash_col: str = "SOURCE_HASH_KEY",
                 historic_key: str = "HISTORIC_SSI",
                 historic_hash: str = "HISTORIC_HASHKEY",
                 broadcast_historic: bool = True,
                 drop_duplicates: bool = True) -> DataFrame:
    """Classify each batch row INSERT/UPDATE/DUPLICATE vs the historic
    slice; optionally drop DUPLICATEs (the reference always does, B5)."""
    hist = F.broadcast(historic) if broadcast_historic else historic
    joined = batch.join(hist, batch[key] == hist[historic_key], "left")
    # eqNullSafe on the hash compare: a NULL hash (not produced by this
    # pipeline's coalesce'd md5, but possible for an external caller)
    # would make `==` yield NULL, skip the DUPLICATE branch, and
    # re-classify the unchanged row UPDATE on EVERY load — growing the
    # mart with spurious history forever. NULL<=>NULL is a duplicate.
    routed = joined.withColumn(
        ROUTER_COL,
        F.when(F.col(historic_key).isNull(), F.lit(INSERT))
         .when(F.col(hash_col).eqNullSafe(F.col(historic_hash)),
               F.lit(DUPLICATE))
         .otherwise(F.lit(UPDATE)),
    )
    if drop_duplicates:
        routed = routed.filter(F.col(ROUTER_COL) != DUPLICATE)
    return routed
