"""Load-audit metrics (A9/D4).

The reference computed TOTAL_UPSERT_COUNT / VALID_COUNT / INVALID_COUNT /
DATA_VALID_PERCENTAGE inside its driver-side upsert loop
(/root/reference/ETL/CSV_Batch_Processing.py:258-334, 383-393; schema
CSD_DATA_LOADS Setup/SQL_DDL_Script.sql:92-104). Here it is one
conditional aggregation — a single map-side-combined pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_audit_metrics(df: DataFrame,
                       valid_col: str = "IS_VALID_DATA",
                       group_by: list[str] | None = None) -> DataFrame:
    """One audit row (or one per group): totals, valid/invalid counts,
    valid percentage."""
    aggs = [
        F.count(F.lit(1)).alias("TOTAL_UPSERT_COUNT"),
        F.sum(F.col(valid_col)).cast("long").alias("VALID_COUNT"),
        (F.count(F.lit(1)) - F.sum(F.col(valid_col))).cast("long").alias("INVALID_COUNT"),
        F.round(F.sum(F.col(valid_col)) / F.count(F.lit(1)) * 100, 2).alias("DATA_VALID_PERCENTAGE"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
