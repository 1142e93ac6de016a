"""Reference-parity operators (SURVEY.md §2) expressed over the driver's
TPC-H-ish testdata, each with a DuckDB oracle twin.

Cross-engine determinism rules used throughout:
- Monetary aggregates go through DECIMAL(18,6) (exact math, identical in
  Spark and DuckDB) and are cast back to double at the end.
- md5 fingerprints hash only string/integer-cast columns (float→string
  formatting differs between engines).
- All output columns are lowercase-aliased on BOTH sides (DuckDB lowers
  unquoted identifiers; the driver sorts columns by name).
- No wall-clock: SCD2 stamps are fixed literals per run (reference H9 is
  a single driver-side datetime.now(); here a lit constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.hashing import row_fingerprint
from pyspark_etl_project_spark.functions.normalize import duration_to_seconds, validity_flag
from pyspark_etl_project_spark.operators.audit import load_audit_metrics
from pyspark_etl_project_spark.operators.cdc import cdc_classify
from pyspark_etl_project_spark.operators.dedup import keep_latest
from pyspark_etl_project_spark.operators.lookup import lookup_join, prepare_dimension
from pyspark_etl_project_spark.operators.scd2 import scd2_merge
from pyspark_etl_project_spark.operators.watermark import latest_version_per_key
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


# --- A1/A4/B2/B6 + A5: scan + filter + projection, unioned with a
# schema-typed empty relation (pushdown-checked) ---------------------------
# (consolidated: the former `empty_relation` query — reference
# ETL/CSV_Batch_Processing.py:34-43 builds an emptyRDD+schema seed frame
# and unions batches into it; here the typed empty seed is unioned with
# the scan, exercising exactly that construction)

@_q("scan_filter_project", """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
""")
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # A5: schema-typed empty seed unioned with the scan. Since r17 the
    # construction is seed_df's single-slice RDD (not the literal
    # createDataFrame([], ddl) idiom — a zero-row frame otherwise costs
    # defaultParallelism empty Python-RDD slices per scan); the A5
    # semantics exercised here are the typed-empty-union, not the
    # construction idiom.
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    seed = seed_df(
        spark,
        [], "l_orderkey bigint, l_linenumber int, l_quantity double, "
            "l_extendedprice double")
    scanned = (li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                 .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
    return seed.unionByName(scanned)


# --- E1/D1/B3/B4: keep-latest dedup via window --------------------------

@_q("window_dedup_latest", """
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = keep_latest(ev, keys="user_id", order_by=["ts", "event_id"], descending=True)
    return out.select("user_id", "event_id", "ts", "event_type")


# The extreme-skew arm of the same operator (SCALE.md sizing rules):
# groupBy + max_by(struct) enables map-side partial aggregation, so a
# hot key combines per partition before the shuffle instead of
# funneling every duplicate through one window task. Same reference E1
# semantics, same oracle — both physical plans of the engine's
# most-used operator are value-verified.

@_q("window_dedup_latest_maxby", """
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def window_dedup_latest_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = keep_latest(ev, keys="user_id", order_by=["ts", "event_id"],
                      descending=True, use_max_by=True)
    return out.select("user_id", "event_id", "ts", "event_type")


# --- C1-C3/B5/H1: CDC hash-compare router -------------------------------

@_q("cdc_router", """
WITH batch AS (
  SELECT 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS ssi,
         md5(concat_ws('||',
             coalesce(o_orderstatus, 'NULL'),
             coalesce(o_orderpriority, 'NULL'))) AS hashkey
  FROM orders
), hist AS (
  SELECT 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS historic_ssi,
         md5(concat_ws('||',
             coalesce(o_orderstatus, 'NULL'),
             coalesce(CASE WHEN o_orderkey % 6 = 0 THEN 'CHANGED'
                           ELSE o_orderpriority END, 'NULL'))) AS historic_hashkey
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT ssi, hashkey, router_group FROM (
  SELECT b.ssi, b.hashkey,
         CASE WHEN h.historic_ssi IS NULL THEN 'INSERT'
              WHEN b.hashkey = h.historic_hashkey THEN 'DUPLICATE'
              ELSE 'UPDATE' END AS router_group
  FROM batch b LEFT JOIN hist h ON b.ssi = h.historic_ssi
) WHERE router_group <> 'DUPLICATE'
""")
def cdc_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    batch = orders.select(
        F.concat(F.lit("ORD - "), F.col("o_orderkey").cast("string")).alias("ssi"),
        row_fingerprint(["o_orderstatus", "o_orderpriority"]).alias("hashkey"),
    )
    hist = (orders.filter(F.col("o_orderkey") % 3 == 0)
            .withColumn("o_orderpriority",
                        F.when(F.col("o_orderkey") % 6 == 0, F.lit("CHANGED"))
                         .otherwise(F.col("o_orderpriority")))
            .select(
                F.concat(F.lit("ORD - "), F.col("o_orderkey").cast("string")).alias("historic_ssi"),
                row_fingerprint(["o_orderstatus", "o_orderpriority"]).alias("historic_hashkey"),
            ))
    routed = cdc_classify(batch, hist, key="ssi", hash_col="hashkey",
                          historic_key="historic_ssi", historic_hash="historic_hashkey")
    return routed.select("ssi", "hashkey", F.col("ROUTER_GROUP").alias("router_group"))


# --- C4: dimension chain as broadcast joins (revenue by region) ---------

@_q("join_dim_broadcast", """
SELECT r.r_name AS region_name,
       CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l.l_discount AS DECIMAL(18,6))) * 100)
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    dim = (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
              .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
              .select("s_suppkey", "r_name"))
    # Exact decimal math end-to-end: the decimal→double cast rounds
    # differently across engines, so the money total ships as int cents.
    rev = (F.col("l_extendedprice").cast("decimal(18,6)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)"))
    return (li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
              .groupBy(F.col("r_name").alias("region_name"))
              .agg(F.floor(F.sum(rev) * 100).cast("long").alias("revenue_cents"),
                   F.count(F.lit(1)).alias("n_items")))


# --- A9/D4: load-audit conditional aggregation --------------------------

@_q("load_audit_metrics", """
SELECT o_orderstatus,
       COUNT(*) AS total_upsert_count,
       CAST(SUM(iv) AS BIGINT) AS valid_count,
       CAST(COUNT(*) - SUM(iv) AS BIGINT) AS invalid_count,
       CAST(SUM(iv) AS BIGINT) / COUNT(*) * 100 AS data_valid_percentage
FROM (SELECT o_orderstatus,
             CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS iv
      FROM orders)
GROUP BY o_orderstatus
""")
def load_audit_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    flagged = orders.withColumn(
        "IS_VALID_DATA", F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
    out = load_audit_metrics(flagged, group_by=["o_orderstatus"])
    return out.select(
        "o_orderstatus",
        F.col("TOTAL_UPSERT_COUNT").alias("total_upsert_count"),
        F.col("VALID_COUNT").alias("valid_count"),
        F.col("INVALID_COUNT").alias("invalid_count"),
        (F.col("VALID_COUNT") / F.col("TOTAL_UPSERT_COUNT") * 100).alias("data_valid_percentage"),
    )


# --- A7/D3 + D2/D6: incremental latest-version-per-key, carrying the MAX
# watermark as a broadcast scalar ------------------------------------------
# (consolidated: the former `max_watermark` query — reference D2/D6 reads
# MAX(id) off the mart to bound the next incremental pull; here the scalar
# rides along every row via a broadcast cross-join, the exact shape the
# watermark operator uses)

@_q("latest_version_per_key", """
SELECT user_id, event_id, event_type, value,
       (SELECT MAX(event_id) FROM events) AS max_event_id
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events WHERE event_id > 500
) WHERE rn = 1
""")
def latest_version_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = latest_version_per_key(ev, key="user_id", version_col="event_id",
                                 watermark=500, watermark_col="event_id")
    # D2/D6 MAX watermark as a 1-row broadcast cross-join (scalar subquery).
    wm = ev.agg(F.max("event_id").alias("max_event_id"))
    return (out.crossJoin(F.broadcast(wm))
               .select("user_id", "event_id", "event_type", "value",
                       "max_event_id"))


# --- D5: DISTINCT projection ---------------------------------------------

@_q("distinct_projection", """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""")
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --- F1 + H1/H8: global sort + null-safe md5 row fingerprint ---------------
# (consolidated: the former `hash_fingerprint` query's column lives here —
# same source table; the orderBy keeps the range-partition exchange in the
# plan, the fingerprint keeps H1/H8 value coverage)

@_q("global_sort", """
SELECT n_nationkey, n_name, n_regionkey,
       md5(concat_ws('||',
           coalesce(CAST(n_nationkey AS VARCHAR), 'NULL'),
           coalesce(n_name, 'NULL'),
           coalesce(CAST(n_regionkey AS VARCHAR), 'NULL'))) AS fingerprint
FROM nation ORDER BY n_name
""")
def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    return (nat.select(
        "n_nationkey", "n_name", "n_regionkey",
        row_fingerprint(["n_nationkey", "n_name", "n_regionkey"]).alias("fingerprint"))
        .orderBy("n_name"))


# --- F2 + I4/H7: top-k + duration→seconds column math ----------------------
# (consolidated: the former `duration_to_seconds` query's columns live
# here — same source table; TakeOrderedAndProject plan shape preserved)

@_q("topk_limit", """
SELECT p_partkey, p_name, p_retailprice, dur_str,
       CAST(string_split(dur_str, ':')[1] AS INTEGER) * 3600
       + CAST(string_split(dur_str, ':')[2] AS INTEGER) * 60
       + CAST(string_split(dur_str, ':')[3] AS INTEGER) AS dur_seconds
FROM (
  SELECT p_partkey, p_name, p_retailprice,
         printf('%d:%02d:%02d', p_size % 3, p_size % 60, (p_size * 7) % 60) AS dur_str
  FROM part)
ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
""")
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    # Reference I4: UDF_Duration_Caluculation.py — H:MM:SS to seconds as
    # pure column math (no Python UDF).
    dur = F.format_string("%d:%02d:%02d",
                          F.col("p_size") % 3, F.col("p_size") % 60,
                          (F.col("p_size") * 7) % 60)
    out = part.select("p_partkey", "p_name", "p_retailprice",
                      dur.alias("dur_str"))
    return (out.withColumn("dur_seconds", duration_to_seconds("dur_str"))
               .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
               .limit(10))


# --- H4/H11/H12 + H13: when/otherwise chains + derived arithmetic ---------
# (consolidated: the former `derived_arithmetic` query's H13 column lives
# here — same source table, same row-wise-transform plan shape)

@_q("case_when_normalize", """
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1
            WHEN o_orderpriority = '2-HIGH' THEN 2
            WHEN o_orderpriority = '3-MEDIUM' THEN 3
            WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 4
            WHEN o_orderpriority = '5-LOW' THEN 5
            ELSE NULL END AS priority_rank,
       CASE WHEN UPPER(o_orderstatus) = 'O' THEN 1
            WHEN UPPER(o_orderstatus) = 'F' THEN 0
            ELSE NULL END AS open_flag,
       o_totalprice,
       o_totalprice * CAST(0.96 AS DOUBLE) AS net_price
FROM orders
""")
def case_when_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pr = F.col("o_orderpriority")
    rank = (F.when(pr == "1-URGENT", 1).when(pr == "2-HIGH", 2)
             .when(pr == "3-MEDIUM", 3).when(pr == "4-NOT SPECIFIED", 4)
             .when(pr == "5-LOW", 5).otherwise(F.lit(None).cast("int")))
    flag = (F.when(F.upper(F.col("o_orderstatus")) == "O", 1)
             .when(F.upper(F.col("o_orderstatus")) == "F", 0)
             .otherwise(F.lit(None).cast("int")))
    # H13 derived arithmetic: the 0.96 literal enters both engines as the
    # same nearest-double, so the per-row product is bit-identical.
    return orders.select("o_orderkey", rank.alias("priority_rank"),
                         flag.alias("open_flag"), "o_totalprice",
                         (F.col("o_totalprice") * F.lit(0.96)).alias("net_price"))


# --- H3: per-source timestamp format parse (round-trip) -------------------

@_q("timestamp_parse_roundtrip", """
SELECT event_id,
       strftime(ts, '%m%d%Y%H%M%S') AS ts_str,
       strptime(strftime(ts, '%m%d%Y%H%M%S'), '%m%d%Y%H%M%S') AS ts_parsed
FROM events
""")
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference CSV format MMddyyyyHHmmss (ETL/CSV_Batch_Processing.py:170).
    ev = load(spark, sf_dir, "events")
    s = F.date_format(F.col("ts"), "MMddyyyyHHmmss")
    return ev.select(
        "event_id", s.alias("ts_str"),
        F.to_timestamp(s, "MMddyyyyHHmmss").alias("ts_parsed"))


# --- A8/H9: SCD2 merge (the flagship custom operator) ---------------------

SCD2_RUN_TS = "2024-06-01 00:00:00"

@_q("scd2_merge", """
WITH mart AS (
  SELECT c_custkey AS csd_id,
         'CUST - ' || CAST(c_custkey AS VARCHAR) AS ssi,
         c_name, c_mktsegment,
         1 AS active_flag,
         TIMESTAMP '2020-01-01 00:00:00' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM customer
), arrivals AS (
  SELECT 'CUST - ' || CAST(c_custkey AS VARCHAR) AS ssi,
         c_name, 'MOVED-' || c_mktsegment AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'CUST - ' || CAST(c_custkey + 1000000 AS VARCHAR) AS ssi,
         c_name, c_mktsegment
  FROM customer WHERE c_custkey % 17 = 0
), offs AS (SELECT MAX(csd_id) AS o FROM mart),
expired AS (
  SELECT csd_id, ssi, c_name, c_mktsegment, 0 AS active_flag, start_date,
         TIMESTAMP '2024-06-01 00:00:00' AS end_date
  FROM mart WHERE ssi IN (SELECT ssi FROM arrivals)
), survivors AS (
  SELECT * FROM mart WHERE ssi NOT IN (SELECT ssi FROM arrivals)
), fresh AS (
  SELECT (SELECT o FROM offs) + ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id,
         ssi, c_name, c_mktsegment, 1 AS active_flag,
         TIMESTAMP '2024-06-01 00:00:00' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM arrivals
)
SELECT * FROM survivors
UNION ALL SELECT * FROM expired
UNION ALL SELECT * FROM fresh
""")
def scd2_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    mart = cust.select(
        F.col("c_custkey").cast("long").alias("csd_id"),
        F.concat(F.lit("CUST - "), F.col("c_custkey").cast("string")).alias("ssi"),
        F.col("c_name"), F.col("c_mktsegment"),
        F.lit(1).alias("active_flag"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("start_date"),
        F.lit("2099-12-31 00:00:00").cast("timestamp").alias("end_date"),
    )
    updates = (cust.filter(F.col("c_custkey") % 10 == 0)
               .select(F.concat(F.lit("CUST - "), F.col("c_custkey").cast("string")).alias("ssi"),
                       F.col("c_name"),
                       F.concat(F.lit("MOVED-"), F.col("c_mktsegment")).alias("c_mktsegment")))
    inserts = (cust.filter(F.col("c_custkey") % 17 == 0)
               .select(F.concat(F.lit("CUST - "),
                                (F.col("c_custkey") + 1000000).cast("string")).alias("ssi"),
                       F.col("c_name"), F.col("c_mktsegment")))
    arrivals = updates.unionByName(inserts)
    merged = scd2_merge(
        mart.withColumnRenamed("active_flag", "ACTIVE_FLAG")
            .withColumnRenamed("start_date", "START_DATE")
            .withColumnRenamed("end_date", "END_DATE"),
        arrivals,
        run_ts=SCD2_RUN_TS, key="ssi", surrogate_col="csd_id", dense_ids=True)
    return merged.select(
        "csd_id", "ssi", "c_name", "c_mktsegment",
        F.col("ACTIVE_FLAG").alias("active_flag"),
        F.col("START_DATE").alias("start_date"),
        F.col("END_DATE").alias("end_date"))


# --- SCD2 on-disk retention roundtrip --------------------------------------
# Gate for vacuum_mart_path (operators/scd2.py), the maintenance pass
# that rewrites the persisted mart under vacuum_expired's predicate and
# deletes fully-dead partition dirs that dynamic overwrite would
# silently leave behind. Modeled on streaming_band_index_compacted: a
# deterministic mixed-expiry history is WRITTEN to disk, vacuumed, the
# query raises unless the maintenance actually changed the physical
# state (the all-expired partition dir must be gone), and the surviving
# rows read back from the maintained store must hash-match the same
# from-scratch END_DATE >= horizon oracle (retention semantics per
# reference SCD2 expiry, /root/reference/ETL/CSV_Batch_Processing.py:
# 311-324 — expired versions carry a closed END_DATE; retention drops
# versions closed before the horizon, keeping open rows and
# recently-closed history so as-of queries inside the window still
# reconstruct).

@_q("scd2_vacuum_roundtrip", """
WITH hist AS (
  SELECT c_custkey AS csd_id,
         'CUST - ' || CAST(c_custkey AS VARCHAR) AS ssi,
         c_mktsegment,
         CASE WHEN c_custkey % 2 = 0 THEN 'RETIRED' ELSE 'ACTIVE' END AS seg,
         0 AS active_flag,
         TIMESTAMP '2020-01-01 00:00:00' AS start_date,
         TIMESTAMP '2020-06-01 00:00:00' AS end_date
  FROM customer
  UNION ALL
  SELECT c_custkey + 10000000,
         'CUST - ' || CAST(c_custkey AS VARCHAR),
         c_mktsegment, 'ACTIVE', 0,
         TIMESTAMP '2020-06-01 00:00:00',
         TIMESTAMP '2024-01-01 00:00:00'
  FROM customer WHERE c_custkey % 2 = 1
  UNION ALL
  SELECT c_custkey + 20000000,
         'CUST - ' || CAST(c_custkey AS VARCHAR),
         c_mktsegment, 'ACTIVE', 1,
         TIMESTAMP '2024-01-01 00:00:00',
         TIMESTAMP '2099-12-31 00:00:00'
  FROM customer WHERE c_custkey % 2 = 1
)
SELECT csd_id, ssi, c_mktsegment, seg, active_flag, start_date, end_date
FROM hist WHERE end_date >= TIMESTAMP '2023-01-01 00:00:00'
""")
def scd2_vacuum_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark_etl_project_spark.operators.scd2 import (
        read_mart, vacuum_mart_path, write_mart)

    cust = load(spark, sf_dir, "customer").select("c_custkey",
                                                  "c_mktsegment")
    ssi = F.concat(F.lit("CUST - "), F.col("c_custkey").cast("string"))
    seg = (F.when(F.col("c_custkey") % 2 == 0, F.lit("RETIRED"))
            .otherwise(F.lit("ACTIVE")))
    odd = F.col("c_custkey") % 2 == 1

    def version(id_off: int, flag: int, start: str, end: str,
                pred=None) -> DataFrame:
        d = cust if pred is None else cust.filter(pred)
        return d.select(
            (F.col("c_custkey") + id_off).cast("long").alias("csd_id"),
            ssi.alias("ssi"), "c_mktsegment", seg.alias("seg"),
            F.lit(flag).alias("active_flag"),
            F.lit(start).cast("timestamp").alias("START_DATE"),
            F.lit(end).cast("timestamp").alias("END_DATE"))

    # Every customer gets one long-expired version; odd keys also get a
    # recently-closed version (survives the horizon) and an open one —
    # so the RETIRED partition is ALL-expired and must physically
    # disappear, while ACTIVE keeps mixed history.
    hist = (version(0, 0, "2020-01-01 00:00:00", "2020-06-01 00:00:00")
            .unionByName(version(10_000_000, 0, "2020-06-01 00:00:00",
                                 "2024-01-01 00:00:00", odd))
            .unionByName(version(20_000_000, 1, "2024-01-01 00:00:00",
                                 "2099-12-31 00:00:00", odd)))
    root = tempfile.mkdtemp(prefix="scd2_vac_")
    # The returned DataFrame reads LAZILY from this dir (the driver /
    # bench collect happens after we return), so an in-scope rmtree
    # would race the read. Process-exit cleanup instead — without it,
    # bench's 5 reps leave 5 marts per run in /tmp.
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = os.path.join(root, "mart")
    write_mart(hist, path, partition_col="seg", key="ssi", num_buckets=8)
    dead_dir = os.path.join(path, "seg=RETIRED")
    if not os.path.isdir(dead_dir):
        raise ValueError("scd2_vacuum_roundtrip: expected the pre-vacuum "
                         "mart to materialize the seg=RETIRED partition")

    vacuum_mart_path(spark, path, "2023-01-01 00:00:00",
                     partition_col="seg", key="ssi", num_buckets=8)
    # The roundtrip must not be vacuous: the all-expired partition's
    # dir has to be GONE (dynamic overwrite alone would leave it, and a
    # reader would resurrect the expired rows).
    if os.path.isdir(dead_dir):
        raise ValueError("scd2_vacuum_roundtrip: vacuum left the "
                         "fully-dead seg=RETIRED partition dir in place")
    return read_mart(spark, path).select(
        "csd_id", "ssi", "c_mktsegment", "seg", "active_flag",
        F.col("START_DATE").alias("start_date"),
        F.col("END_DATE").alias("end_date"))


# --- SCD2 vacuum heal of a TYPE-evolved mart -------------------------------
# Gate for _widened_footer_schema (operators/scd2.py): a mart whose
# loads wrote the SAME column at different numeric widths (csd_id int
# in load 1, long in load 2) defeats Spark's mergeSchema probe
# (CANNOT_MERGE_SCHEMAS — Spark never widens), so the vacuum's
# distributed footer scan pins the reader-verified supertype and the
# rewrite HEALS the mart to a uniform schema. The query raises unless
# the heal is observable (a PLAIN post-vacuum read sees bigint), and
# the survivors must hash-match the from-scratch retention oracle —
# including load-2 ids above 2^31 that an int pin would corrupt.

@_q("scd2_vacuum_type_widened", """
WITH hist AS (
  SELECT CAST(c_custkey AS BIGINT) AS csd_id,
         'CUST - ' || CAST(c_custkey AS VARCHAR) AS ssi,
         'L1' AS seg,
         CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '2020-06-01 00:00:00'
              ELSE TIMESTAMP '2099-12-31 00:00:00' END AS end_date
  FROM customer
  UNION ALL
  SELECT CAST(c_custkey + 10000000000 AS BIGINT),
         'CUST2 - ' || CAST(c_custkey AS VARCHAR),
         'L2',
         CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '2020-06-01 00:00:00'
              ELSE TIMESTAMP '2099-12-31 00:00:00' END
  FROM customer
)
SELECT csd_id, ssi, seg, end_date
FROM hist WHERE end_date >= TIMESTAMP '2023-01-01 00:00:00'
""")
def scd2_vacuum_type_widened_q(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark_etl_project_spark.operators.scd2 import (
        vacuum_mart_path, write_mart)

    cust = load(spark, sf_dir, "customer").select("c_custkey")

    def version(csd, ssi_prefix: str, seg: str, expired) -> DataFrame:
        return cust.select(
            csd.alias("csd_id"),
            F.concat(F.lit(ssi_prefix),
                     F.col("c_custkey").cast("string")).alias("ssi"),
            F.lit(seg).alias("seg"),
            F.lit("2020-01-01 00:00:00").cast("timestamp")
             .alias("START_DATE"),
            F.when(expired, F.lit("2020-06-01 00:00:00"))
             .otherwise(F.lit("2099-12-31 00:00:00"))
             .cast("timestamp").alias("END_DATE"))

    root = tempfile.mkdtemp(prefix="scd2_vac_widen_")
    # Lazy read after return (driver collects later) — process-exit
    # cleanup, same rationale as scd2_vacuum_roundtrip.
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = os.path.join(root, "mart")
    # Load 1: csd_id INT. Load 2: csd_id LONG, above 2^31.
    write_mart(version(F.col("c_custkey").cast("int"), "CUST - ", "L1",
                       F.col("c_custkey") % 2 == 0),
               path, partition_col="seg", key="ssi", num_buckets=8)
    write_mart(version((F.col("c_custkey") + 10_000_000_000)
                       .cast("long"), "CUST2 - ", "L2",
                       F.col("c_custkey") % 3 == 0),
               path, partition_col="seg", key="ssi", num_buckets=8)

    vacuum_mart_path(spark, path, "2023-01-01 00:00:00",
                     partition_col="seg", key="ssi", num_buckets=8)
    # Non-vacuous: the heal must be OBSERVABLE — a plain read (no
    # mergeSchema crutch) succeeds and sees the widened type.
    healed = spark.read.parquet(path)
    if dict(healed.dtypes).get("csd_id") != "bigint":
        raise ValueError("scd2_vacuum_type_widened: post-vacuum mart "
                         "is not healed to bigint csd_id — got "
                         f"{dict(healed.dtypes).get('csd_id')!r}")
    return healed.select("csd_id", "ssi", "seg",
                         F.col("END_DATE").alias("end_date"))


# --- H10 + H6: validity flag + rating floor quirk -------------------------
# (consolidated: the former `rating_floor_scale` query's H6 column lives
# here — same source table, same row-wise-transform plan shape)

@_q("validity_flag", """
SELECT l_orderkey, l_linenumber,
       CASE WHEN nullif(l_returnflag, 'N') IS NULL
              OR nullif(l_linestatus, 'F') IS NULL
            THEN 0 ELSE 1 END AS is_valid_data,
       CAST(FLOOR(FLOOR(l_quantity) / 2) AS INTEGER) AS rating_five
FROM lineitem
""")
def validity_flag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = (li.withColumn("ret", F.nullif(F.col("l_returnflag"), F.lit("N")))
             .withColumn("st", F.nullif(F.col("l_linestatus"), F.lit("F"))))
    # rating_five: floor(r/2) reproduces the reference's rating-1→0 quirk
    # (JSON:209).
    return out.select(
        "l_orderkey", "l_linenumber",
        validity_flag(["ret", "st"]).alias("is_valid_data"),
        F.floor(F.floor(F.col("l_quantity")) / 2).cast("int").alias("rating_five"))


# --- C4 full semantics + C5: dim prep (top-1 by date) + lookup join,
# carrying a scalar-subquery top-1 column ----------------------------------
# (consolidated: the former `scalar_lookup_top1` query — C5's scalar
# subquery semantics are expressed as an actual scalar subquery in the
# oracle and a 1-row broadcast cross-join in the plan)

@_q("dim_prep_lookup", """
WITH dim AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END AS active_flag
  FROM orders
), prepared AS (
  SELECT o_custkey, o_orderkey FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM dim WHERE active_flag = 1
  ) WHERE rn = 1
)
SELECT c.c_custkey, c.c_name, p.o_orderkey AS latest_order,
       (SELECT c2.c_custkey FROM customer c2
        ORDER BY c2.c_acctbal DESC, c2.c_custkey ASC LIMIT 1) AS richest_custkey
FROM customer c LEFT JOIN prepared p ON c.c_custkey = p.o_custkey
""")
def dim_prep_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    dim = orders.select(
        F.col("o_custkey"), F.col("o_orderkey"),
        F.col("o_orderdate").alias("START_DATE"),
        F.when(F.col("o_orderstatus") != "F", 1).otherwise(0).alias("ACTIVE_FLAG"))
    # single_partition=False: this "dimension" is the SF-scaled orders
    # table, not a seeded dim — the dedup window must parallelize on
    # the key exchange (r17 ADVICE: a coalesce(1) here would pull the
    # whole fact scan+sort into one task at scale).
    prepared = prepare_dimension(dim, key_col="o_custkey",
                                 id_col="o_orderkey",
                                 single_partition=False)
    out = lookup_join(cust, prepared, fact_key="c_custkey", dim_key="o_custkey",
                      id_col="o_orderkey", out_col="latest_order")
    # C5 scalar top-1 lookup: deterministic tie-broken top-1, broadcast to
    # every row (reference: max-id scalar reads before assigning new ids).
    top1 = (cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
                .limit(1).select(F.col("c_custkey").alias("richest_custkey")))
    return (out.select("c_custkey", "c_name", "latest_order")
               .crossJoin(F.broadcast(top1)))
