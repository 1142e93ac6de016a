"""Single-slice construction for tiny driver-local frames.

``spark.createDataFrame(rows, ...)`` parallelizes even a 15-row seed
into ``defaultParallelism`` Python-RDD partitions, so EVERY scan of the
frame pays that many Python-worker evaluations (~0.1 s of wall per scan
at local[32], and multiple seconds if anything downstream coalesces the
partitions into one task, which serializes the worker rounds — measured
on the seed dimensions in the optimization round). A driver-local seed
is one partition by definition; build it that way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def seed_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """createDataFrame over exactly ONE slice. ``schema`` is a DDL
    string or StructType, same as createDataFrame. Empty ``rows`` still
    yields a single (empty) partition, not defaultParallelism of them."""
    rdd = spark.sparkContext.parallelize(rows, 1)
    return spark.createDataFrame(rdd, schema=schema)
