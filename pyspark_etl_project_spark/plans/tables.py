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
      (Spark 4 infers NTZ); convert with pure wall-clock arithmetic
      (days-since-epoch + time-of-day micros → timestamp_micros) so the
      instant equals the wall clock read as UTC REGARDLESS of the
      caller session's time zone. A plain cast would consult the
      session TZ and shift epoch-based results (unix_micros, window
      alignment) relative to DuckDB under any non-UTC harness session;
      to_utc/from_utc/convert_timezone round-trips are still off by an
      hour inside DST-ambiguous renderings. The arithmetic path never
      consults a TZ at all.
    - plain TIMESTAMP → already fine, pass through.
    """
    import datetime

    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        c = F.col("ts")
        days = F.datediff(c.cast("date"), F.lit(datetime.date(1970, 1, 1)))
        sec_micros = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
        total = (days.cast("long") * 86_400_000_000
                 + F.hour(c).cast("long") * 3_600_000_000
                 + F.minute(c).cast("long") * 60_000_000
                 + sec_micros)
        df = df.withColumn("ts", F.timestamp_micros(total))
    return df
