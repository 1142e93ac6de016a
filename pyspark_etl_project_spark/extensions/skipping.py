"""Min-max manifest data skipping: a sorted-write layout plus a
file-level stats manifest, and a read path that prunes files BEFORE
Spark ever lists them into a scan.

This is the table-format data-skipping trick (Delta/Iceberg manifests,
Hive min-max indexes) as a standalone operator pair: parquet footers
already carry per-column min/max, but the engine only consults them
AFTER the scan enumerates every file — at 100 TB the listing +
footer-read of ~100k files is itself the bottleneck for a selective
query. A manifest table (one row per file) turns that into one tiny
scan and an explicit file list.

Write path: range-partition on the sort column so each file owns a
disjoint value range (that's what makes min-max selective), write, then
build the manifest FROM THE WRITTEN FILES via the `_metadata.file_path`
hidden column — a distributed one-column scan, so the manifest always
describes the bytes on disk, never the lineage that produced them
(same reasoning as corpus._stats — ADVICE r5).

Read path: scan the manifest (KiB), keep files whose [min,max]
intersects the predicate range, and hand Spark only that file list plus
the residual row-level filter. Result is exactly equal to the full
scan + filter: pruning drops only files whose whole range misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


def write_skipping_layout(df: DataFrame, path: str, sort_col: str,
                          num_files: int) -> None:
    """Write ``df`` as a range-clustered parquet layout plus a min-max
    manifest. One range exchange (the same shuffle a sorted write needs
    anyway) and one metadata-light column scan for the manifest."""
    data_path = f"{path}/{DATA_DIR}"
    (df.repartitionByRange(num_files, F.col(sort_col))
       .sortWithinPartitions(sort_col)
       .write.mode("overwrite").parquet(data_path))
    spark = df.sparkSession
    manifest = (spark.read.parquet(data_path)
                .select(F.col("_metadata.file_path").alias("file_path"),
                        F.col(sort_col))
                .groupBy("file_path")
                .agg(F.min(sort_col).alias("min_val"),
                     F.max(sort_col).alias("max_val"),
                     F.count(F.lit(1)).alias("n_rows")))
    (manifest.coalesce(1)
             .write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}"))


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{MANIFEST_DIR}")


def pruned_scan(spark: SparkSession, path: str, sort_col: str,
                lo, hi) -> DataFrame:
    """Scan only the files whose [min,max] range intersects [lo, hi],
    with the residual filter applied row-level. The manifest collect is
    bounded by the FILE count (one small row per file — the same order
    of driver memory Spark's own file listing already uses), never by
    data volume."""
    files = [r["file_path"]
             for r in (read_manifest(spark, path)
                       .filter((F.col("max_val") >= F.lit(lo))
                               & (F.col("min_val") <= F.lit(hi)))
                       .select("file_path").collect())]
    full = spark.read.parquet(f"{path}/{DATA_DIR}")
    if not files:
        return full.filter(F.lit(False))
    pred = (F.col(sort_col) >= F.lit(lo)) & (F.col(sort_col) <= F.lit(hi))
    return spark.read.parquet(*files).filter(pred)


def pruned_file_fraction(spark: SparkSession, path: str, lo, hi) -> tuple:
    """(files_selected, files_total) for a range — the skipping
    effectiveness metric tests assert on."""
    m = read_manifest(spark, path)
    total = m.count()
    kept = m.filter((F.col("max_val") >= F.lit(lo))
                    & (F.col("min_val") <= F.lit(hi))).count()
    return kept, total
