"""Curated-corpus sink: the layout the curation pipeline's output lives
in at 100 TB, plus the pruned read path and a stats sidecar.

Layout: parquet partitioned by (split, lang) — the two columns every
downstream consumer filters on (a trainer reads split='train'; per-lang
loaders read one lang). Equality filters on them prune at FILE LISTING,
so reading one split of a 100 TB corpus lists ~that split's files, not
the corpus. zstd at rest, matching the mart sink.

The stats sidecar (one tiny parquet under ``_stats``, leading underscore
so parquet listing ignores it) holds per-partition doc/token counts —
the numbers a mixture-weighting or budget-planning step needs without
scanning data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIR = "_stats"


def write_curated_corpus(df: DataFrame, path: str,
                         partition_cols: tuple[str, ...] = ("split", "lang"),
                         token_count_col: str | None = "n_tokens") -> None:
    """Write the curated corpus partitioned by ``partition_cols`` with a
    per-partition stats sidecar. The stats aggregation is one extra
    map-combinable pass over the same frame; at scale both the write and
    the stats shuffle on the (low-cardinality) partition key."""
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns missing from frame: {missing}")
    (df.write.mode("overwrite")
       .partitionBy(*partition_cols)
       .option("compression", "zstd")
       .parquet(path))
    # Stats come from the files just written, not from df's lineage:
    # re-running the upstream pipeline would be a second full pass AND
    # could disagree with the data on disk if any upstream stage is
    # nondeterministic. Reading back scans only parquet footers' worth
    # of columns (partition values + one token column) of data already
    # local to the sink.
    written = df.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_count_col and token_count_col in written.columns:
        aggs.append(F.sum(token_count_col).cast("long").alias("total_tokens"))
    stats = written.groupBy(*partition_cols).agg(*aggs)
    (stats.coalesce(1).write.mode("overwrite")
          .parquet(f"{path}/{STATS_DIR}"))


def read_corpus(spark: SparkSession, path: str, **equals) -> DataFrame:
    """Read the corpus with equality filters on partition columns (e.g.
    ``read_corpus(spark, p, split="train")``) — expressed as DataFrame
    filters so Catalyst turns them into partition-pruning at file
    listing; non-partition columns degrade gracefully to data filters."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == val)
    return df


def corpus_stats(spark: SparkSession, path: str) -> DataFrame:
    """The stats sidecar as a DataFrame (k rows, k = #partitions)."""
    return spark.read.parquet(f"{path}/{STATS_DIR}")
