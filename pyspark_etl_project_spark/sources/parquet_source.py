"""Parquet bronze scans with schema evolution (beyond-reference: the
reference's feeds have frozen schemas, but a long-lived 100 TB bronze
layer accretes columns over time — new loads add fields, old files keep
their narrower footprint).

``mergeSchema`` unions every file's footer schema at planning time;
rows from pre-evolution files read the new columns as NULL. Column
pruning and filter pushdown still apply per file — a query over the old
columns never pays for the new ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_evolved(spark: SparkSession, *paths: str,
                 expect_schema: str | None = None) -> DataFrame:
    """Read one or more parquet directories whose schemas may have
    evolved (columns added over time). ``expect_schema`` (DDL string)
    optionally pins the result shape: missing columns are NULL-filled,
    unexpected extras rejected — the explicit-schema discipline the
    engine applies to every other source (SURVEY.md §1.2).

    Scale note: schema merging reads FOOTERS of every file at planning
    time; on a huge bronze table prefer a pinned ``expect_schema`` plus
    per-partition-dir reads, or maintain the merged schema in a catalog
    — both paths work through this same entry point."""
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if expect_schema is not None:
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        want = StructType.fromDDL(expect_schema)
        have = {f.name.lower(): f for f in df.schema.fields}
        extras = set(have) - {f.name.lower() for f in want.fields}
        if extras:
            raise ValueError(f"unexpected columns in evolved read: {sorted(extras)}")
        cols = []
        for f in want.fields:
            if f.name.lower() in have:
                cols.append(F.col(f.name).cast(f.dataType))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        df = df.select(*cols)
    return df
