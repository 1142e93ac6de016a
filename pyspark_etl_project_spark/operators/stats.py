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
                    qs: list[int], n: int | None = None) -> DataFrame:
    """Exact discrete quantiles (nearest-rank, 1-based position
    floor((n-1)*q/100)+1) of ``value_col``, ordered with
    ``tiebreak_col`` so the selected row is unique.

    Scale shape: one range exchange for the global rank (dense_row_number
    keeps the sort distributed; its side plan is one row per partition),
    one `.count()` scan for n (columnar, cheap), then a len(qs)-row
    broadcast join picks the quantile rows — no window over a single
    partition anywhere. Returns (q, value) with q from ``qs``.

    (Optimization-round note: a fully-lazy variant deriving n from
    MAX(_rn) inside the plan was measured ~0.1 s faster per call but
    needs a 1-row crossJoin attach, which breaks the registry-wide
    EMPTY cartesian/BNLJ allowlists under the disabled-auto-broadcast
    sweep — reverted; the count() stays.)

    ``n`` lets a caller that already KNOWS the row count (e.g. MAD's
    second pass — the deviation frame has exactly the value frame's
    count) skip the count() job; it must equal df's true count.
    """
    from pyspark_etl_project_spark.operators.scd2 import dense_row_number

    if n is None:
        n = df.count()
    spark = df.sparkSession
    positions = [(int(q), (max(n - 1, 0) * int(q)) // 100 + 1) for q in qs]
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    pos_df = F.broadcast(seed_df(spark, positions, "q long, _pos long"))
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
    # ONE count serves both quantile passes: the deviation frame has
    # exactly vals' row count (a broadcast inner join against the
    # 1-row median multiplies nothing), so the second pass's count()
    # job is skipped (guide §1.2: don't re-run jobs for facts you
    # already hold).
    n = vals.count()
    med = (exact_quantiles(vals, value_col, id_col, [50], n=n)
           .select(F.col("value").alias("_med")))
    dev = (vals.join(F.broadcast(med))
           .withColumn("abs_dev",
                       F.abs(F.col(value_col) - F.col("_med")))
           .localCheckpoint(eager=False))
    mad = (exact_quantiles(dev.select(id_col, "abs_dev"), "abs_dev",
                           id_col, [50], n=n)
           .select(F.col("value").alias("_mad")))
    return (dev.join(F.broadcast(mad))
            .select(id_col, value_col, "abs_dev",
                    (F.col("abs_dev") > k_mad * F.col("_mad"))
                    .cast("int").alias("is_outlier")))


# --- write-time partial column stats (ANALYZE without the rescan) -----------

KMV_MAX_H = 1 << 48


def kmv_value_hash(col: F.Column, salt: str) -> F.Column:
    """48-bit salted-md5 value hash — THE hash every KMV surface in the
    repo keys on (batch sketch, streaming appends, stats partials). One
    definition: the estimator's bit-identity guarantees break if any
    site drifts from the others."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col)),
                              1, 12), 16, 10).cast("long")


def kmv_estimate_expr(k: int) -> F.Column:
    """Integer KMV estimate over a (_cnt, _kth) single-row frame:
    exact-fallback when fewer than k distinct hashes exist (every hash
    survived, the count IS the NDV), else (k-1)*2^48 div kth-min."""
    return F.expr(f"cast(case when _cnt < {k} then _cnt else"
                  f" ({k} - 1) * cast({KMV_MAX_H} as bigint) div _kth end"
                  " as bigint)")


def column_stats_partials(df: DataFrame, part: F.Column, value: F.Column,
                          k: int = 64, salt: str = "pstats-v1"):
    """Per-partition column-stats PARTIALS — what a 100 TB writer
    stamps per file at write time so ANALYZE never rescans the table:

    - scalar partials (part, n_rows, n_nulls, min_v, max_v): all
      decomposable (sum/sum/min/max merge);
    - NDV partials (part, h): each partition's k SMALLEST distinct
      48-bit md5 value-hashes — the KMV sketch state, which merges
      associatively (k-min of a union == k-min of per-part k-mins),
      so the merged estimate is BIT-IDENTICAL to the direct sketch
      over the whole table, not approximately equal.

    ``value`` must be an order-preserving, cross-engine-exact
    representation (integer cents, epoch-us, raw strings — never raw
    doubles: the hash input is the value's string form). The per-part
    k-cut window partitions on `part` (file granularity — bounded by
    rows-per-file, the same shape kmv_distinct_sketch documents).
    Gated end-to-end by `partial_stats_merge`.
    """
    from pyspark.sql import Window

    base = df.select(part.alias("part"), value.alias("v"))
    scalar = (base.groupBy("part")
              .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                   F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                    .cast("long").alias("n_nulls"),
                   F.min("v").alias("min_v"),
                   F.max("v").alias("max_v")))
    # Hash BEFORE the distinct: one (part, h) exchange carrying 8-byte
    # hashes replaces the former distinct-on-string -> hash ->
    # distinct-on-hash chain (two exchanges, the first shuffling full
    # value strings). The set is identical — distinct values map to
    # the same hash set, and hash collisions collapse either way (the
    # KMV contract dedupes on the HASH) — but the md5 now runs
    # map-side and only (part, h) partials cross the wire
    # (guide §2.3 "shuffle fewer bytes" / §2.4 "remove shuffles").
    hashed = (base.filter(F.col("v").isNotNull())
              .select("part",
                      kmv_value_hash(F.col("v").cast("string"), salt)
                       .alias("h"))
              .distinct())
    w = Window.partitionBy("part").orderBy("h")
    hashes = (hashed.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= k).select("part", "h"))
    return scalar, hashes


def column_stats_merge(scalar: DataFrame, hashes: DataFrame,
                       k: int = 64) -> DataFrame:
    """Fold partials into one stats row: counts add, bounds combine,
    and the NDV estimate comes from the k smallest of the unioned hash
    partials (orderBy+limit -> TakeOrderedAndProject, never a global
    window). When fewer than k distinct hashes exist in total, every
    distinct hash survived the per-part cuts, so the count IS the
    exact NDV (the sketch's exact-fallback arm). Returns one row
    (n_rows, n_nulls, min_v, max_v, est_ndv)."""
    s = scalar.agg(F.sum("n_rows").cast("long").alias("n_rows"),
                   F.sum("n_nulls").cast("long").alias("n_nulls"),
                   F.min("min_v").alias("min_v"),
                   F.max("max_v").alias("max_v"))
    km = (hashes.select("h").distinct().orderBy("h").limit(k)
          .agg(F.count(F.lit(1)).alias("_cnt"),
               F.max("h").alias("_kth")))
    return (s.crossJoin(F.broadcast(km))
            .select("n_rows", "n_nulls", "min_v", "max_v",
                    kmv_estimate_expr(k).alias("est_ndv")))


def column_stats_direct(df: DataFrame, value: F.Column, k: int = 64,
                        salt: str = "pstats-v1") -> DataFrame:
    """The rescan ANALYZE path the partials replace: same five stats
    computed directly over the whole frame (plus exact_ndv, the
    calibration reference), so `merged == direct` is checkable. The
    sketch arm reuses column_stats_merge's k-min cut over the full
    distinct-hash set — identical estimator arithmetic. Every arm
    (partials, merge, direct — and the DuckDB twin) dedupes on the
    HASH, not just the value, so a 48-bit collision landing in the
    bottom-k cannot split merged from direct."""
    base = df.select(value.alias("v"))
    s = base.agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_nulls"),
                 F.min("v").alias("min_v"),
                 F.max("v").alias("max_v"),
                 F.countDistinct("v").cast("long").alias("exact_ndv"))
    # Same single-exchange shape as column_stats_partials: hash
    # map-side, distinct once on the 8-byte hash (identical set — the
    # estimator dedupes on the hash anyway).
    hashed = (base.filter(F.col("v").isNotNull())
              .select(kmv_value_hash(F.col("v").cast("string"), salt)
                       .alias("h"))
              .distinct())
    km = (hashed.orderBy("h").limit(k)
          .agg(F.count(F.lit(1)).alias("_cnt"),
               F.max("h").alias("_kth")))
    return (s.crossJoin(F.broadcast(km))
            .select("n_rows", "n_nulls", "min_v", "max_v", "exact_ndv",
                    kmv_estimate_expr(k).alias("est_ndv")))
