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
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark sessions
        # reject (PARQUET_TYPE_ILLEGAL). The conf is runtime-settable, so set
        # it here on the *caller's* session rather than relying on our own
        # session factory having done it (session.py sets it too, but external
        # harnesses build their own sessions).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _fix_nanos_ts(df)
    return df


def _fix_nanos_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS): read as long (see
    session.py nanosAsLong) and truncate to microseconds — matching how
    DuckDB reads the same column as its microsecond TIMESTAMP."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
