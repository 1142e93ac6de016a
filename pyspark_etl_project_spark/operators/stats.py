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
