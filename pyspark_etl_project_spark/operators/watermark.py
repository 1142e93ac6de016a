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
