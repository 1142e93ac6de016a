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


def observed_audit(df: DataFrame, metrics: dict[str, "F.Column"],
                   name: str = "load_audit"):
    """Single-pass audit via the Observation API: attach aggregate
    metrics to ``df`` so they are computed AS A SIDE-EFFECT of whatever
    action consumes it (the mart write, a sink) — zero extra scan of
    the data, where `load_audit_metrics` costs one dedicated
    aggregation pass. At 100 TB that second pass is the difference
    between auditing for free and doubling the read.

    Returns ``(observed_df, observation)``; read
    ``observation.get`` AFTER an action has run on ``observed_df``.
    Metrics must be aggregate expressions with no distinct/window (the
    API's contract)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
