"""Testdata table loading helpers for the oracle-facing query plans."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Generators have shipped events.ts as parquet TIMESTAMP(NANOS),
        # which vanilla Spark sessions reject (PARQUET_TYPE_ILLEGAL). The
        # conf is runtime-settable, so set it here on the *caller's* session
        # rather than relying on our own session factory having done it
        # (session.py sets it too, but external harnesses build their own
        # sessions). Harmless when the data is already micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _fix_nanos_ts(df)
    return df


def _fix_nanos_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a session-TZ TIMESTAMP regardless of the
    parquet physical encoding the generator used:

    - TIMESTAMP(NANOS) → surfaces as bigint under nanosAsLong; truncate
      to microseconds — matching how DuckDB reads the same column as its
      microsecond TIMESTAMP.
    - timestamp[us] isAdjustedToUTC=false → surfaces as TIMESTAMP_NTZ
      (Spark 4 infers NTZ); cast to TIMESTAMP. The session TZ is UTC
      (session.py), so the wall-clock values are unchanged and functions
      like unix_micros/window resolve.
    - plain TIMESTAMP → already fine, pass through.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
