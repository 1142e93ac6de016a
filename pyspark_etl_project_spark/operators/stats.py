"""Exact distributed order statistics.

`approx_percentile` is the usual Spark answer, but its sketch is
engine-specific (t-digest-like) — useless for a cross-engine gate and
unnecessary when the exact answer is affordable: a discrete quantile is
just "the value at row floor((n-1)*q/100)+1 of the sorted order", and
the two-phase range-partitioned row number (operators/scd2.py:
dense_row_number) computes global ranks WITHOUT a single-task sort.
Integer outputs, deterministic tie-break — the repo-wide cross-engine
rules applied to order statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(df: DataFrame, value_col: str, tiebreak_col: str,
                    qs: list[int]) -> DataFrame:
    """Exact discrete quantiles (nearest-rank, 1-based position
    floor((n-1)*q/100)+1) of ``value_col``, ordered with
    ``tiebreak_col`` so the selected row is unique.

    Scale shape: one range exchange for the global rank (dense_row_number
    keeps the sort distributed; its side plan is one row per partition),
    one `.count()` scan for n (columnar, cheap), then a len(qs)-row
    broadcast join picks the quantile rows — no window over a single
    partition anywhere. Returns (q, value) with q from ``qs``.
    """
    from pyspark_etl_project_spark.operators.scd2 import dense_row_number

    n = df.count()
    spark = df.sparkSession
    positions = [(int(q), (max(n - 1, 0) * int(q)) // 100 + 1) for q in qs]
    pos_df = F.broadcast(spark.createDataFrame(positions, "q long, _pos long"))
    ranked = dense_row_number(df.select(value_col, tiebreak_col),
                              [value_col, tiebreak_col], "_rn")
    out = ranked.join(pos_df, ranked["_rn"] == pos_df["_pos"])
    return out.select("q", F.col(value_col).alias("value"))


def mad_length_outliers(df: DataFrame, id_col: str, value_col: str,
                        k_mad: int = 3) -> DataFrame:
    """Robust outlier flagging by median absolute deviation — the
    corpus-cleaning gate that survives what a mean/stddev z-score
    cannot (a handful of giant documents drag the mean and hide
    themselves; the median and MAD are immune to half the data being
    garbage). Integer-exact end-to-end: both the median and the MAD
    are nearest-rank order statistics (exact_quantiles — the two-phase
    range-partitioned row number, never a one-task sort), and the cut
    ``abs_dev > k_mad * mad`` is bigint arithmetic.

    Returns (id_col, value_col, abs_dev, is_outlier 0/1). Scale shape:
    two exact-quantile passes (one range exchange each) and two 1-row
    broadcasts — nothing else."""
    from pyspark.sql import functions as F

    # vals feeds the median branch AND the deviation frame; dev feeds
    # the MAD branch AND the output. Lazy localCheckpoints pin each so
    # the quantile side-branches don't replay the upstream lineage.
    vals = (df.select(F.col(id_col), F.col(value_col).cast("bigint")
                      .alias(value_col))
            .localCheckpoint(eager=False))
    med = (exact_quantiles(vals, value_col, id_col, [50])
           .select(F.col("value").alias("_med")))
    dev = (vals.join(F.broadcast(med))
           .withColumn("abs_dev",
                       F.abs(F.col(value_col) - F.col("_med")))
           .localCheckpoint(eager=False))
    mad = (exact_quantiles(dev.select(id_col, "abs_dev"), "abs_dev",
                           id_col, [50])
           .select(F.col("value").alias("_mad")))
    return (dev.join(F.broadcast(mad))
            .select(id_col, value_col, "abs_dev",
                    (F.col("abs_dev") > k_mad * F.col("_mad"))
                    .cast("int").alias("is_outlier")))
