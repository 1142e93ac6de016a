"""Incremental high-watermark helpers.

Reference D2/A7/D3 (SURVEY.md §2): MAX(ARCHIVE_ID) resume point
(/root/reference/ETL/XML_Streaming.py:78-81) and "latest archived version
per record" via correlated MAX subquery
(/root/reference/ETL/XML_Batch_Processing.py:394-397) — decorrelated here
as a window, which Catalyst executes as one hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_watermark(df: DataFrame, col: str) -> int | None:
    """MAX(col) as a scalar; None on empty input."""
    row = df.agg(F.max(col).alias("m")).first()
    return row["m"] if row else None


def latest_version_per_key(df: DataFrame,
                           key: str,
                           version_col: str,
                           watermark: int | None = None,
                           watermark_col: str | None = None) -> DataFrame:
    """Rows newer than the watermark, keeping only the max-version row per
    key (re-delivered records collapse to the latest archived copy)."""
    out = df
    if watermark is not None:
        out = out.filter(F.col(watermark_col or key) > F.lit(watermark))
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .drop("_rn"))


def save_watermark(spark, path: str, source: str, value: int) -> None:
    """Persist a per-source high watermark (the durable form of the
    reference's LAST_LOADED_RECORD_ID column,
    /root/reference/Setup/SQL_DDL_Script.sql:7). The table is tiny (one
    row per source); whole-table rewrite per update is deliberate — no
    read-modify-write races within a single driver, and the value is
    only advanced after the corresponding load commits."""
    current = {r["source"]: r["wm"] for r in read_watermarks(spark, path).collect()}
    current[source] = value
    df = spark.createDataFrame(sorted(current.items()), "source string, wm long")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def read_watermarks(spark, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], "source string, wm long")


def read_watermark(spark, path: str, source: str) -> int | None:
    rows = read_watermarks(spark, path).filter(F.col("source") == source).collect()
    return rows[0]["wm"] if rows else None


# --- surrogate high-water mark --------------------------------------------
# The SCD2 merge needs MAX(CSD_ID) to continue the id sequence; scanning
# the mart for it is O(mart) per incremental batch. Persist it in this
# same tiny watermark table under a reserved "<source>#surrogate" key,
# advanced after each load commits — the merge then starts from a 1-row
# read, falling back to the mart agg only when the entry is absent
# (first load, or recovering from a lost watermark table).

def save_surrogate_hwm(spark, path: str, source: str, value: int) -> None:
    save_watermark(spark, path, f"{source}#surrogate", value)


def read_surrogate_hwm(spark, path: str, source: str) -> int | None:
    return read_watermark(spark, path, f"{source}#surrogate")
