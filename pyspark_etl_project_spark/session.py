"""SparkSession factory.

Replaces the reference's per-pipeline session builders
(/root/reference/ETL/CSV_Batch_Processing.py:355 and siblings) with one
shared, scale-tuned factory.

Local-mode testing defaults; on a real cluster the same configs hold
(AQE, adaptive skew join, Arrow) while master/memory come from
spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def get_spark(app_name: str = "pyspark_etl_project_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    - UTC session timezone: deterministic timestamps, comparable with the
      DuckDB oracle (UTC-naive).
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
      which is what makes the same plan survive a 100x scale-up.
    - Arrow on: fast pandas interchange for the Pandas-UDF extensions.
    """
    # One env read drives BOTH master parallelism and shuffle width —
    # an import-time snapshot could silently disagree with a caller
    # that sets SPARK_GRAFT_CPUS after import.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(cpus if shuffle_partitions is None
                else shuffle_partitions)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4's DataFrame-debugging hook wraps EVERY DataFrame
        # API call with call-site capture: getActiveSession + a conf
        # read + PySparkCurrentOrigin.set/clear = 3-4 extra py4j round
        # trips per call. Off, plan construction of the ETL pipeline
        # queries drops ~2x (1.8 s -> 0.9 s measured warm) — pure
        # driver-side latency at ANY cluster scale; the only cost is
        # losing Python call-site lines inside JVM error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver's events table stores TIMESTAMP(NANOS) which Spark
        # rejects; read as long and convert in plans.tables.load_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zstd for data at rest: ~30-40% smaller than snappy at parquet
        # scan-speed parity — at 100 TB that is tens of TB less I/O.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # NB: runtime bloom-filter/semi-join-reduction injection was
        # measured to blow up driver-side planning on this engine's
        # bushy multi-join plans (the optimizer's subtree search, not
        # execution) — left at Spark's defaults deliberately.
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
