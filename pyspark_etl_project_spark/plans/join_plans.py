"""Custom-join operator queries: as-of join, bucketed range join, and
salted skew-aware aggregation — beyond-reference extensions (the
reference's only join is the CDC left join, SURVEY.md §2.C), each with
a value-level DuckDB oracle (the as-of twin uses DuckDB's native
ASOF JOIN, so our window formulation is checked against an independent
implementation of the semantics, not a restatement of itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.operators.joins import asof_join, range_join, salted_agg
from pyspark_etl_project_spark.plans.tables import load

QUERIES = {}
ORACLE = {}


def _q(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# --- as-of join: each view event gets the latest prior purchase -----------

@_q("asof_join_view_purchase", """
SELECT l.user_id, l.event_id, l.ts AS view_ts,
       r.event_id AS purchase_event_id, r.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND r.ts <= l.ts
""")
def asof_join_view_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = (ev.filter(F.col("event_type") == "view")
               .select("user_id", "event_id", F.col("ts").alias("view_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("user_id", F.col("ts").alias("pts"),
                           F.col("event_id").alias("purchase_event_id"),
                           F.col("ts").alias("purchase_ts")))
    return asof_join(views, purchases, on="user_id",
                     left_ts="view_ts", right_ts="pts",
                     right_cols=["purchase_event_id", "purchase_ts"],
                     direction="backward")


# --- bucketed range join: points into variable-width intervals ------------

@_q("range_join_event_intervals", """
SELECT e.event_id, s.s_suppkey,
       s.s_suppkey * 97 AS r_start,
       s.s_suppkey * 97 + s.s_suppkey % 50 + 10 AS r_end
FROM events e
JOIN supplier s
  ON e.event_id >= s.s_suppkey * 97
 AND e.event_id <  s.s_suppkey * 97 + s.s_suppkey % 50 + 10
""")
def range_join_event_intervals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id")
    sk = F.col("s_suppkey")
    intervals = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (sk * 97).alias("r_start"),
        (sk * 97 + sk % 50 + 10).alias("r_end"))
    return range_join(ev, intervals, point="event_id",
                      start="r_start", end="r_end", bucket_width=64)


# --- salted skew-aware aggregation ----------------------------------------
# l_returnflag has 3 distinct values over the whole fact table — the
# canonical hot-key layout. The salted two-phase plan splits each hot
# key across 16 reducers; the merged result must equal the plain
# GROUP BY (decimal partials keep the sum exact under any grouping).

@_q("salted_skew_agg", """
SELECT l_returnflag,
       CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 100) AS BIGINT)
         AS qty_cents,
       COUNT(*) AS n_rows,
       CAST(FLOOR(MAX(CAST(l_extendedprice AS DECIMAL(18,6))) * 100) AS BIGINT)
         AS max_price_cents
FROM lineitem GROUP BY l_returnflag
""")
def salted_skew_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  F.col("l_quantity").cast("decimal(18,6)").alias("qty_dec"),
                  F.col("l_extendedprice").cast("decimal(18,6)").alias("price_dec")))
    merged = salted_agg(li, "l_returnflag",
                        [("qty_dec", "sum", "qty_sum"),
                         ("qty_dec", "count", "n_rows"),
                         ("price_dec", "max", "max_price")],
                        num_salts=16)
    return merged.select(
        "l_returnflag",
        F.floor(F.col("qty_sum") * 100).cast("long").alias("qty_cents"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.floor(F.col("max_price") * 100).cast("long").alias("max_price_cents"))


# --- rollup aggregation (subtotals + grand total in one pass) -------------
# Beyond-reference breadth: the reference has no grouping sets
# (SURVEY.md §2.D note). Spark expands ROLLUP into one Expand + single
# shuffle — subtotal layers do NOT rescan the fact table.

@_q("rollup_flag_status", """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 100) AS BIGINT)
         AS qty_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_flag_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.floor(F.sum(F.col("l_quantity").cast("decimal(18,6)")) * 100)
                    .cast("long").alias("qty_cents")))
