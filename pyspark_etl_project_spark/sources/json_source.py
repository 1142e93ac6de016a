"""JSON KV feed scan (A2/B1): nested {key, value:{13 fields}} records.

Reference: /root/reference/ETL/JSON_Batch_Processing.py:53-80 +
Setup/NO_SQL_DB_Setup.py:80-111 — a driver-side pickledb range query.
Here the feed lands as JSON lines parsed ON EXECUTORS (from_json /
schema'd read); the pickledb `id > watermark` range op becomes a plain
filter the scanner pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.schemas import JSON_INTERACTIONS_SCHEMA


def read_json_interactions(spark: SparkSession, path: str,
                           watermark: int | None = None) -> DataFrame:
    """Read newline-delimited {key, value} records; flatten value.* with
    the ingest key kept as the dedup/watermark ordering column."""
    df = spark.read.schema(JSON_INTERACTIONS_SCHEMA).json(path)
    return _flatten(df, watermark)


def json_records_df(spark: SparkSession, records: list[dict],
                    watermark: int | None = None) -> DataFrame:
    """Build the same frame from already-fetched KV records (test path —
    mirrors the reference's list-of-dicts createDataFrame)."""
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    df = seed_df(spark, records, JSON_INTERACTIONS_SCHEMA)
    return _flatten(df, watermark)


def _flatten(df: DataFrame, watermark: int | None) -> DataFrame:
    if watermark is not None:
        df = df.filter(F.col("key") > watermark)
    return df.select(F.col("key").alias("_ingest_order"), "value.*")
