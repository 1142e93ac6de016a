"""End-to-end ETL pipeline queries: a deterministic feed synthesized from
the testdata drives the REAL pipeline code (source → dedup → hash → CDC →
normalize → dim lookup → validity → SCD2 merge), and the oracle replicates
every step in SQL — the strongest parity proof the driver can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.dims import seed_agents, seed_customer_types, seed_support_areas
from pyspark_etl_project_spark.pipelines.common import empty_mart, run_load
from pyspark_etl_project_spark.pipelines.csv_pipeline import csv_transform
from pyspark_etl_project_spark.pipelines.json_pipeline import json_transform
from pyspark_etl_project_spark.pipelines.xml_pipeline import xml_transform
from pyspark_etl_project_spark.plans.tables import load


def _seed_dims(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "agents": seed_agents(spark),
        "support_areas": seed_support_areas(spark),
        "customer_types": seed_customer_types(spark),
    }


def _mart_lower(mart: DataFrame) -> DataFrame:
    """Final mart projection with stable lowercase names shared by the
    oracle twins (driver compare sorts columns by name)."""
    pairs = [
        ("CSD_ID", "csd_id"), ("SOURCE_ID", "source_id"),
        ("SOURCE_SYSTEM_IDENTIFIER", "ssi"), ("AGENT_ID", "agent_id"),
        ("INTERACTION_DATE", "interaction_date"),
        ("SUPPORT_AREA_ID", "support_area_id"),
        ("INTERACTION_STATUS", "interaction_status"),
        ("INTERACTION_TYPE", "interaction_type"),
        ("CUSTOMER_TYPE_ID", "customer_type_id"),
        ("HANDLE_TIME", "handle_time"), ("WORK_TIME", "work_time"),
        ("FIRST_CONTACT_RESOLUTION", "first_contact_resolution"),
        ("QUERY_STATUS", "query_status"), ("SOLUTION_TYPE", "solution_type"),
        ("CUSTOMER_RATING", "customer_rating"),
        ("SOURCE_HASH_KEY", "source_hash_key"),
        ("DATA_LOAD_ID", "data_load_id"), ("IS_VALID_DATA", "is_valid_data"),
        ("ACTIVE_FLAG", "active_flag"), ("START_DATE", "start_date"),
        ("END_DATE", "end_date"),
    ]
    return mart.select(*[F.col(a).alias(b) for a, b in pairs])

QUERIES = {}
ORACLE = {}


def _q(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


_RUN_TS = "2024-06-01 00:00:00"

# Feed synthesis: orders → AT&T ticket feed (all derivations are pure
# functions of o_orderkey / o_orderstatus / o_orderpriority / o_orderdate
# so the oracle can rebuild the identical feed).
_FEED_SQL = """
  SELECT CAST(o_orderkey AS INTEGER) AS t_id,
         CASE o_orderpriority WHEN '1-URGENT' THEN 'BILLING'
              WHEN '2-HIGH' THEN 'NETWORK COVERAGE'
              WHEN '3-MEDIUM' THEN 'DEVICE SUPPORT'
              WHEN '4-NOT SPECIFIED' THEN 'PLAN CHANGES'
              ELSE 'INTERNATIONAL ROAMING' END AS support_category,
         'ATT-AGENT-0' || CAST(o_orderkey % 5 + 1 AS VARCHAR) AS agent_name,
         strftime(o_orderdate, '%m%d%Y%H%M%S') AS date_of_call,
         CASE o_orderstatus WHEN 'O' THEN 'COMPLETED'
              WHEN 'F' THEN 'DROPPED' ELSE 'TRANSFERRED' END AS call_status,
         CASE WHEN o_orderkey % 2 = 0 THEN 'CALL' ELSE 'CHAT' END AS call_type,
         CASE o_orderkey % 4 WHEN 0 THEN 'PREPAID' WHEN 1 THEN 'POSTPAID'
              WHEN 2 THEN 'ENTERPRISE' ELSE 'FAMILY PLAN' END AS type_of_customer,
         CAST(o_orderkey % 580 + 20 AS INTEGER) AS duration,
         CAST(o_orderkey % 100 + 10 AS INTEGER) AS work_time,
         'RESOLVED' AS ticket_status,
         CAST(o_orderkey % 2 AS INTEGER) AS resolved_fc,
         'SELF-HELP OPTION' AS resolution_category,
         CASE o_orderkey % 5 WHEN 0 THEN 'WORST' WHEN 1 THEN 'BAD'
              WHEN 2 THEN 'NEUTRAL' WHEN 3 THEN 'GOOD' ELSE 'BEST' END AS rating
  FROM orders WHERE o_orderkey < 1000
"""

@_q("etl_csv_pipeline_full", f"""
WITH feed AS ({_FEED_SQL}),
staged AS (
  SELECT 'AT&T - ' || CAST(t_id AS VARCHAR) AS ssi,
         10 + (t_id % 5 + 1) AS agent_id,
         strptime(date_of_call, '%m%d%Y%H%M%S') AS interaction_date,
         CASE support_category WHEN 'BILLING' THEN 11
              WHEN 'NETWORK COVERAGE' THEN 12 WHEN 'DEVICE SUPPORT' THEN 13
              WHEN 'PLAN CHANGES' THEN 14 ELSE 15 END AS support_area_id,
         call_status AS interaction_status,
         call_type AS interaction_type,
         CASE type_of_customer WHEN 'PREPAID' THEN 9 WHEN 'POSTPAID' THEN 10
              WHEN 'ENTERPRISE' THEN 11 ELSE 12 END AS customer_type_id,
         duration AS handle_time,
         work_time,
         resolved_fc AS first_contact_resolution,
         ticket_status AS query_status,
         resolution_category AS solution_type,
         CASE rating WHEN 'WORST' THEN 1 WHEN 'BAD' THEN 2 WHEN 'NEUTRAL' THEN 3
              WHEN 'GOOD' THEN 4 ELSE 5 END AS customer_rating,
         md5(concat_ws('||',
             coalesce(CAST(t_id AS VARCHAR), 'NULL'),
             coalesce(support_category, 'NULL'),
             coalesce(agent_name, 'NULL'),
             coalesce(date_of_call, 'NULL'),
             coalesce(call_status, 'NULL'),
             coalesce(call_type, 'NULL'),
             coalesce(type_of_customer, 'NULL'),
             coalesce(CAST(duration AS VARCHAR), 'NULL'),
             coalesce(CAST(work_time AS VARCHAR), 'NULL'),
             coalesce(ticket_status, 'NULL'),
             coalesce(CAST(resolved_fc AS VARCHAR), 'NULL'),
             coalesce(resolution_category, 'NULL'),
             coalesce(rating, 'NULL'))) AS source_hash_key
  FROM feed)
SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id,
       3 AS source_id, ssi, agent_id, interaction_date, support_area_id,
       interaction_status, interaction_type, customer_type_id, handle_time,
       work_time, first_contact_resolution, query_status, solution_type,
       customer_rating, source_hash_key,
       CAST(42 AS BIGINT) AS data_load_id,
       1 AS is_valid_data, 1 AS active_flag,
       TIMESTAMP '{_RUN_TS}' AS start_date,
       TIMESTAMP '2099-12-31 00:00:00' AS end_date
FROM staged
""")
def etl_csv_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    pr = F.col("o_orderpriority")
    feed = orders.select(
        k.cast("int").alias("TICKET_IDENTIFIER"),
        (F.when(pr == "1-URGENT", "BILLING")
          .when(pr == "2-HIGH", "NETWORK COVERAGE")
          .when(pr == "3-MEDIUM", "DEVICE SUPPORT")
          .when(pr == "4-NOT SPECIFIED", "PLAN CHANGES")
          .otherwise("INTERNATIONAL ROAMING")).alias("SUPPORT_CATEGORY"),
        F.concat(F.lit("ATT-AGENT-0"), (k % 5 + 1).cast("string")).alias("AGENT_NAME"),
        F.date_format("o_orderdate", "MMddyyyyHHmmss").alias("DATE_OF_CALL"),
        (F.when(F.col("o_orderstatus") == "O", "COMPLETED")
          .when(F.col("o_orderstatus") == "F", "DROPPED")
          .otherwise("TRANSFERRED")).alias("CALL_STATUS"),
        F.when(k % 2 == 0, "CALL").otherwise("CHAT").alias("CALL_TYPE"),
        (F.when(k % 4 == 0, "PREPAID").when(k % 4 == 1, "POSTPAID")
          .when(k % 4 == 2, "ENTERPRISE").otherwise("FAMILY PLAN")).alias("TYPE_OF_CUSTOMER"),
        (k % 580 + 20).cast("int").alias("DURATION"),
        (k % 100 + 10).cast("int").alias("WORK_TIME"),
        F.lit("RESOLVED").alias("TICKET_STATUS"),
        (k % 2).cast("int").alias("RESOLVED_IN_FIRST_CONTACT"),
        F.lit("SELF-HELP OPTION").alias("RESOLUTION_CATEGORY"),
        (F.when(k % 5 == 0, "WORST").when(k % 5 == 1, "BAD")
          .when(k % 5 == 2, "NEUTRAL").when(k % 5 == 3, "GOOD")
          .otherwise("BEST")).alias("RATING"),
        k.alias("_ingest_order"),
    )
    dims = _seed_dims(spark)
    staged = csv_transform(feed, dims, data_load_id=42)
    mart, _audit = run_load(empty_mart(spark), staged, _RUN_TS, source_id=3, dense_ids=True,
                          surrogate_offset=0)
    return _mart_lower(mart)


# --- AMAZON JSON pipeline, end to end -------------------------------------
# Beyond the CSV query this one exercises keep-latest dedup (10% of keys
# re-emitted with fresh values and a later ingest id), the duplicate
# customer-type dimension rows (PROMO-SEEKER must resolve to the NEWER id
# 13 — reference Setup/SQL_DML_Script.sql:425-429 + ETL/DB_Lookup.py:48-54),
# the floor(r/2) rating quirk (H6), YES/NO normalization with a third
# unknown token driving IS_VALID_DATA=0 (H10/H12), and the JSON hash rule
# of fingerprinting the TYPED timestamp (§3.2).

@_q("etl_json_pipeline_full", f"""
WITH feed AS (
  SELECT CAST(o_orderkey AS INTEGER) AS iid,
         CASE o_orderpriority WHEN '1-URGENT' THEN 'ORDER ISSUES'
              WHEN '2-HIGH' THEN 'PAYMENTS'
              WHEN '3-MEDIUM' THEN 'RETURNS & REFUNDS'
              WHEN '4-NOT SPECIFIED' THEN 'PRIME MEMBERSHIP'
              ELSE 'MARKETPLACE & THIRD-PARTY SELLERS' END AS support_category,
         'AMZ-AGENT-0' || CAST(o_orderkey % 5 + 1 AS VARCHAR) AS agent_name,
         CAST(o_orderdate AS TIMESTAMP) AS contact_ts,
         CASE o_orderstatus WHEN 'O' THEN 'COMPLETED'
              WHEN 'F' THEN 'DROPPED' ELSE 'TRANSFERRED' END AS interaction_status,
         CASE WHEN o_orderkey % 2 = 0 THEN 'CALL' ELSE 'CHAT' END AS interaction_type,
         CASE o_orderkey % 4 WHEN 0 THEN 'REGULAR' WHEN 1 THEN 'PRIME'
              WHEN 2 THEN 'BUSINESS' ELSE 'PROMO-SEEKER' END AS type_of_customer,
         CAST(o_orderkey % 580 + 20 AS INTEGER) AS duration,
         CAST(o_orderkey % 580 + 20 + o_orderkey % 100 + 10
              + CASE WHEN o_orderkey % 10 = 0 THEN 60 ELSE 0 END AS INTEGER) AS total_time,
         'RESOLVED' AS incident_status,
         CASE o_orderkey % 3 WHEN 0 THEN 'YES' WHEN 1 THEN 'NO'
              ELSE 'UNKNOWN' END AS resolved_fc,
         'SELF-HELP OPTION' AS solution_type,
         CAST(CASE WHEN o_orderkey % 10 = 0 THEN 10
              ELSE o_orderkey % 10 + 1 END AS INTEGER) AS rating
  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000),
staged AS (
  SELECT 'AMAZON - ' || CAST(iid AS VARCHAR) AS ssi,
         CAST(iid % 5 + 1 AS INTEGER) AS agent_id,
         contact_ts AS interaction_date,
         CASE support_category WHEN 'ORDER ISSUES' THEN 1 WHEN 'PAYMENTS' THEN 2
              WHEN 'RETURNS & REFUNDS' THEN 3 WHEN 'PRIME MEMBERSHIP' THEN 4
              ELSE 5 END AS support_area_id,
         interaction_status, interaction_type,
         CASE type_of_customer WHEN 'REGULAR' THEN 1 WHEN 'PRIME' THEN 2
              WHEN 'BUSINESS' THEN 3 ELSE 13 END AS customer_type_id,
         duration AS handle_time,
         total_time - duration AS work_time,
         CASE resolved_fc WHEN 'YES' THEN 1 WHEN 'NO' THEN 0
              ELSE NULL END AS first_contact_resolution,
         incident_status AS query_status,
         solution_type,
         CAST(FLOOR(rating / 2.0) AS INTEGER) AS customer_rating,
         md5(concat_ws('||',
             coalesce(CAST(iid AS VARCHAR), 'NULL'),
             coalesce(support_category, 'NULL'),
             coalesce(agent_name, 'NULL'),
             coalesce(CAST(contact_ts AS VARCHAR), 'NULL'),
             coalesce(interaction_status, 'NULL'),
             coalesce(interaction_type, 'NULL'),
             coalesce(type_of_customer, 'NULL'),
             coalesce(CAST(duration AS VARCHAR), 'NULL'),
             coalesce(CAST(total_time AS VARCHAR), 'NULL'),
             coalesce(incident_status, 'NULL'),
             coalesce(resolved_fc, 'NULL'),
             coalesce(solution_type, 'NULL'),
             coalesce(CAST(rating AS VARCHAR), 'NULL'))) AS source_hash_key
  FROM feed)
SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id,
       1 AS source_id, ssi, agent_id, interaction_date, support_area_id,
       interaction_status, interaction_type, customer_type_id, handle_time,
       work_time, first_contact_resolution, query_status, solution_type,
       customer_rating, source_hash_key,
       CAST(77 AS BIGINT) AS data_load_id,
       CASE WHEN first_contact_resolution IS NULL THEN 0 ELSE 1 END AS is_valid_data,
       1 AS active_flag,
       TIMESTAMP '{_RUN_TS}' AS start_date,
       TIMESTAMP '2099-12-31 00:00:00' AS end_date
FROM staged
""")
def etl_json_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
    k = F.col("o_orderkey")
    pr = F.col("o_orderpriority")
    base = orders.select(
        k.cast("int").alias("INTERACTION_ID"),
        (F.when(pr == "1-URGENT", "ORDER ISSUES")
          .when(pr == "2-HIGH", "PAYMENTS")
          .when(pr == "3-MEDIUM", "RETURNS & REFUNDS")
          .when(pr == "4-NOT SPECIFIED", "PRIME MEMBERSHIP")
          .otherwise("MARKETPLACE & THIRD-PARTY SELLERS")).alias("SUPPORT_CATEGORY"),
        F.concat(F.lit("AMZ-AGENT-0"), (k % 5 + 1).cast("string")).alias("AGENT_PSEUDO_NAME"),
        F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss").alias("CONTACT_DATE"),
        (F.when(F.col("o_orderstatus") == "O", "COMPLETED")
          .when(F.col("o_orderstatus") == "F", "DROPPED")
          .otherwise("TRANSFERRED")).alias("INTERACTION_STATUS"),
        F.when(k % 2 == 0, "CALL").otherwise("CHAT").alias("INTERACTION_TYPE"),
        (F.when(k % 4 == 0, "REGULAR").when(k % 4 == 1, "PRIME")
          .when(k % 4 == 2, "BUSINESS").otherwise("PROMO-SEEKER")).alias("TYPE_OF_CUSTOMER"),
        (k % 580 + 20).cast("int").alias("INTERACTION_DURATION"),
        (k % 580 + 20 + k % 100 + 10).cast("int").alias("TOTAL_TIME"),
        F.lit("RESOLVED").alias("STATUS_OF_CUSTOMER_INCIDENT"),
        (F.when(k % 3 == 0, "YES").when(k % 3 == 1, "NO")
          .otherwise("UNKNOWN")).alias("RESOLVED_IN_FIRST_CONTACT"),
        F.lit("SELF-HELP OPTION").alias("SOLUTION_TYPE"),
        (k % 10 + 1).cast("int").alias("RATING"),
        k.cast("long").alias("_ingest_order"),
    )
    # 10% of keys arrive again later with fresh values (higher rating,
    # longer total time, later ingest id) — keep-latest dedup must keep
    # exactly these versions.
    reemit = (base.filter(F.col("INTERACTION_ID") % 10 == 0)
                  .withColumn("RATING", F.lit(10).cast("int"))
                  .withColumn("TOTAL_TIME", (F.col("TOTAL_TIME") + 60).cast("int"))
                  .withColumn("_ingest_order", F.col("_ingest_order") + F.lit(1000000)))
    feed = base.unionByName(reemit)
    staged = json_transform(feed, _seed_dims(spark), data_load_id=77)
    mart, _audit = run_load(empty_mart(spark), staged, _RUN_TS, source_id=1, dense_ids=True,
                          surrogate_offset=0)
    return _mart_lower(mart)


# --- UBER XML pipeline, end to end ----------------------------------------
# Exercises: ARCHIVE_ID keep-latest over a re-delivered subset whose only
# change is TIME_STAMP (the §3.3 quirk — TIME_STAMP participates in the
# hash, so a re-delivery is a real new version), 'H:MM:SS' durations to
# seconds as pure column math (I4 without the UDF), TRUE/FALSE boolean
# normalization with an N/A token driving IS_VALID_DATA=0, and the
# LONG-TERM CUSTOMER duplicate-dimension row (newer id 14).

@_q("etl_xml_pipeline_full", f"""
WITH feed AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS sid_str,
         CAST(o_orderkey AS INTEGER) AS k,
         CASE o_orderpriority WHEN '1-URGENT' THEN 'RIDE ISSUES'
              WHEN '2-HIGH' THEN 'DRIVER FEEDBACK'
              WHEN '3-MEDIUM' THEN 'FARE DISPUTES'
              WHEN '4-NOT SPECIFIED' THEN 'ACCOUNT & APP'
              ELSE 'SAFETY CONCERNS' END AS contact_regarding,
         'UBR-AGENT-0' || CAST(o_orderkey % 5 + 1 AS VARCHAR) AS agent_code,
         strftime(o_orderdate, '%Y%m%d%H%M%S') AS date_str,
         CASE o_orderstatus WHEN 'O' THEN 'COMPLETED'
              WHEN 'F' THEN 'DROPPED' ELSE 'TRANSFERRED' END AS status_of_interaction,
         CASE WHEN o_orderkey % 2 = 0 THEN 'CALL' ELSE 'CHAT' END AS type_of_interaction,
         CASE o_orderkey % 4 WHEN 0 THEN 'RIDER' WHEN 1 THEN 'DRIVER'
              WHEN 2 THEN 'UBER-ONE' ELSE 'LONG-TERM CUSTOMER' END AS customer_type,
         CAST(o_orderkey % 3 AS VARCHAR) || ':'
             || lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(o_orderkey * 7 % 60 AS VARCHAR), 2, '0') AS contact_duration,
         '0:' || lpad(CAST(o_orderkey % 30 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(o_orderkey * 3 % 60 AS VARCHAR), 2, '0') AS after_contact_work_time,
         'RESOLVED' AS incident_status,
         CASE o_orderkey % 3 WHEN 0 THEN 'TRUE' WHEN 1 THEN 'FALSE'
              ELSE 'N/A' END AS first_contact_solve,
         'SELF-HELP OPTION' AS type_of_resolution,
         CAST(o_orderkey % 5 + 1 AS VARCHAR) AS support_rating,
         CASE WHEN o_orderkey % 7 = 0 THEN CAST(o_orderkey * 10 + 1 AS VARCHAR)
              ELSE CAST(o_orderkey * 10 AS VARCHAR) END AS time_stamp
  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 3000),
staged AS (
  SELECT 'UBER - ' || sid_str AS ssi,
         CAST(k % 5 + 6 AS INTEGER) AS agent_id,
         strptime(date_str, '%Y%m%d%H%M%S') AS interaction_date,
         CASE contact_regarding WHEN 'RIDE ISSUES' THEN 6
              WHEN 'DRIVER FEEDBACK' THEN 7 WHEN 'FARE DISPUTES' THEN 8
              WHEN 'ACCOUNT & APP' THEN 9 ELSE 10 END AS support_area_id,
         status_of_interaction AS interaction_status,
         type_of_interaction AS interaction_type,
         CASE customer_type WHEN 'RIDER' THEN 5 WHEN 'DRIVER' THEN 6
              WHEN 'UBER-ONE' THEN 7 ELSE 14 END AS customer_type_id,
         CAST((k % 3) * 3600 + (k % 60) * 60 + k * 7 % 60 AS INTEGER) AS handle_time,
         CAST((k % 30) * 60 + k * 3 % 60 AS INTEGER) AS work_time,
         CASE first_contact_solve WHEN 'TRUE' THEN 1 WHEN 'FALSE' THEN 0
              ELSE NULL END AS first_contact_resolution,
         incident_status AS query_status,
         type_of_resolution AS solution_type,
         CAST(k % 5 + 1 AS INTEGER) AS customer_rating,
         md5(concat_ws('||',
             coalesce(sid_str, 'NULL'),
             coalesce(contact_regarding, 'NULL'),
             coalesce(agent_code, 'NULL'),
             coalesce(date_str, 'NULL'),
             coalesce(status_of_interaction, 'NULL'),
             coalesce(type_of_interaction, 'NULL'),
             coalesce(customer_type, 'NULL'),
             coalesce(contact_duration, 'NULL'),
             coalesce(after_contact_work_time, 'NULL'),
             coalesce(incident_status, 'NULL'),
             coalesce(first_contact_solve, 'NULL'),
             coalesce(type_of_resolution, 'NULL'),
             coalesce(support_rating, 'NULL'),
             coalesce(time_stamp, 'NULL'))) AS source_hash_key
  FROM feed)
SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id,
       2 AS source_id, ssi, agent_id, interaction_date, support_area_id,
       interaction_status, interaction_type, customer_type_id, handle_time,
       work_time, first_contact_resolution, query_status, solution_type,
       customer_rating, source_hash_key,
       CAST(88 AS BIGINT) AS data_load_id,
       CASE WHEN first_contact_resolution IS NULL THEN 0 ELSE 1 END AS is_valid_data,
       1 AS active_flag,
       TIMESTAMP '{_RUN_TS}' AS start_date,
       TIMESTAMP '2099-12-31 00:00:00' AS end_date
FROM staged
""")
def etl_xml_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000))
    k = F.col("o_orderkey")
    pr = F.col("o_orderpriority")
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    base = orders.select(
        k.cast("string").alias("SUPPORT_IDENTIFIER"),
        (F.when(pr == "1-URGENT", "RIDE ISSUES")
          .when(pr == "2-HIGH", "DRIVER FEEDBACK")
          .when(pr == "3-MEDIUM", "FARE DISPUTES")
          .when(pr == "4-NOT SPECIFIED", "ACCOUNT & APP")
          .otherwise("SAFETY CONCERNS")).alias("CONTACT_REGARDING"),
        F.concat(F.lit("UBR-AGENT-0"), (k % 5 + 1).cast("string")).alias("AGENT_CODE"),
        F.date_format("o_orderdate", "yyyyMMddHHmmss").alias("DATE_OF_INTERACTION"),
        (F.when(F.col("o_orderstatus") == "O", "COMPLETED")
          .when(F.col("o_orderstatus") == "F", "DROPPED")
          .otherwise("TRANSFERRED")).alias("STATUS_OF_INTERACTION"),
        F.when(k % 2 == 0, "CALL").otherwise("CHAT").alias("TYPE_OF_INTERACTION"),
        (F.when(k % 4 == 0, "RIDER").when(k % 4 == 1, "DRIVER")
          .when(k % 4 == 2, "UBER-ONE").otherwise("LONG-TERM CUSTOMER")).alias("CUSTOMER_TYPE"),
        F.concat((k % 3).cast("string"), F.lit(":"), two(k % 60),
                 F.lit(":"), two(k * 7 % 60)).alias("CONTACT_DURATION"),
        F.concat(F.lit("0:"), two(k % 30), F.lit(":"),
                 two(k * 3 % 60)).alias("AFTER_CONTACT_WORK_TIME"),
        F.lit("RESOLVED").alias("INCIDENT_STATUS"),
        (F.when(k % 3 == 0, "TRUE").when(k % 3 == 1, "FALSE")
          .otherwise("N/A")).alias("FIRST_CONTACT_SOLVE"),
        F.lit("SELF-HELP OPTION").alias("TYPE_OF_RESOLUTION"),
        (k % 5 + 1).cast("string").alias("SUPPORT_RATING"),
        (k * 10).cast("string").alias("TIME_STAMP"),
        k.cast("long").alias("ARCHIVE_ID"),
    )
    # Re-delivery of a subset: identical content, fresh TIME_STAMP, later
    # ARCHIVE_ID — keep-latest keeps the re-delivery, whose hash DIFFERS
    # because TIME_STAMP is hashed (reference XML:163-168 quirk).
    redeliver = (base.filter(F.col("ARCHIVE_ID") % 7 == 0)
                     .withColumn("TIME_STAMP",
                                 (F.col("ARCHIVE_ID") * 10 + 1).cast("string"))
                     .withColumn("ARCHIVE_ID", F.col("ARCHIVE_ID") + F.lit(1000000)))
    feed = base.unionByName(redeliver)
    staged = xml_transform(feed, _seed_dims(spark), data_load_id=88)
    mart, _audit = run_load(empty_mart(spark), staged, _RUN_TS, source_id=2, dense_ids=True,
                          surrogate_offset=0)
    return _mart_lower(mart)


# --- two-load incremental CSV pipeline ------------------------------------
# The full reference lifecycle in one oracle-checked query: load 1 lands
# keys [0,500) into an empty mart; load 2 re-sends [250,500) (unchanged
# rows -> DUPLICATE -> dropped; every 5th key's rating changed -> UPDATE
# -> expire old + fresh active row) plus new keys [500,750) (INSERT).
# Asserted end-state: SCD2 history, END_DATE == successor START_DATE,
# dense surrogate ids continuing from load 1's max.

_T1_2L = "2024-05-01 00:00:00"
_T2_2L = "2024-06-01 00:00:00"


def _att_feed(orders, lo: int, hi: int, shift: bool):
    """AT&T feed over order keys [lo,hi); shift=True alters every 5th
    key's rating (WORST->BEST), producing hash-differing re-sends."""
    k = F.col("o_orderkey")
    pr = F.col("o_orderpriority")
    rating = (F.when(k % 5 == 0, F.lit("BEST") if shift else F.lit("WORST"))
               .when(k % 5 == 1, "BAD").when(k % 5 == 2, "NEUTRAL")
               .when(k % 5 == 3, "GOOD").otherwise("BEST"))
    return orders.filter((k >= lo) & (k < hi)).select(
        k.cast("int").alias("TICKET_IDENTIFIER"),
        (F.when(pr == "1-URGENT", "BILLING")
          .when(pr == "2-HIGH", "NETWORK COVERAGE")
          .when(pr == "3-MEDIUM", "DEVICE SUPPORT")
          .when(pr == "4-NOT SPECIFIED", "PLAN CHANGES")
          .otherwise("INTERNATIONAL ROAMING")).alias("SUPPORT_CATEGORY"),
        F.concat(F.lit("ATT-AGENT-0"), (k % 5 + 1).cast("string")).alias("AGENT_NAME"),
        F.date_format("o_orderdate", "MMddyyyyHHmmss").alias("DATE_OF_CALL"),
        (F.when(F.col("o_orderstatus") == "O", "COMPLETED")
          .when(F.col("o_orderstatus") == "F", "DROPPED")
          .otherwise("TRANSFERRED")).alias("CALL_STATUS"),
        F.when(k % 2 == 0, "CALL").otherwise("CHAT").alias("CALL_TYPE"),
        (F.when(k % 4 == 0, "PREPAID").when(k % 4 == 1, "POSTPAID")
          .when(k % 4 == 2, "ENTERPRISE").otherwise("FAMILY PLAN")).alias("TYPE_OF_CUSTOMER"),
        (k % 580 + 20).cast("int").alias("DURATION"),
        (k % 100 + 10).cast("int").alias("WORK_TIME"),
        F.lit("RESOLVED").alias("TICKET_STATUS"),
        (k % 2).cast("int").alias("RESOLVED_IN_FIRST_CONTACT"),
        F.lit("SELF-HELP OPTION").alias("RESOLUTION_CATEGORY"),
        rating.alias("RATING"),
        k.alias("_ingest_order"),
    )


def _att_staged_sql(lo: int, hi: int, shift: bool, load_id: int) -> str:
    shifted_first = "'BEST'" if shift else "'WORST'"
    return f"""
  SELECT 'AT&T - ' || CAST(o_orderkey AS VARCHAR) AS ssi,
         CAST(10 + (o_orderkey % 5 + 1) AS INTEGER) AS agent_id,
         CAST(o_orderdate AS TIMESTAMP) AS interaction_date,
         CASE o_orderpriority WHEN '1-URGENT' THEN 11 WHEN '2-HIGH' THEN 12
              WHEN '3-MEDIUM' THEN 13 WHEN '4-NOT SPECIFIED' THEN 14
              ELSE 15 END AS support_area_id,
         CASE o_orderstatus WHEN 'O' THEN 'COMPLETED' WHEN 'F' THEN 'DROPPED'
              ELSE 'TRANSFERRED' END AS interaction_status,
         CASE WHEN o_orderkey % 2 = 0 THEN 'CALL' ELSE 'CHAT' END AS interaction_type,
         CASE o_orderkey % 4 WHEN 0 THEN 9 WHEN 1 THEN 10 WHEN 2 THEN 11
              ELSE 12 END AS customer_type_id,
         CAST(o_orderkey % 580 + 20 AS INTEGER) AS handle_time,
         CAST(o_orderkey % 100 + 10 AS INTEGER) AS work_time,
         CAST(o_orderkey % 2 AS INTEGER) AS first_contact_resolution,
         'RESOLVED' AS query_status,
         'SELF-HELP OPTION' AS solution_type,
         CASE o_orderkey % 5 WHEN 0 THEN {5 if shift else 1} WHEN 1 THEN 2
              WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 5 END AS customer_rating,
         md5(concat_ws('||',
             CAST(o_orderkey AS VARCHAR),
             CASE o_orderpriority WHEN '1-URGENT' THEN 'BILLING'
                  WHEN '2-HIGH' THEN 'NETWORK COVERAGE'
                  WHEN '3-MEDIUM' THEN 'DEVICE SUPPORT'
                  WHEN '4-NOT SPECIFIED' THEN 'PLAN CHANGES'
                  ELSE 'INTERNATIONAL ROAMING' END,
             'ATT-AGENT-0' || CAST(o_orderkey % 5 + 1 AS VARCHAR),
             strftime(o_orderdate, '%m%d%Y%H%M%S'),
             CASE o_orderstatus WHEN 'O' THEN 'COMPLETED' WHEN 'F' THEN 'DROPPED'
                  ELSE 'TRANSFERRED' END,
             CASE WHEN o_orderkey % 2 = 0 THEN 'CALL' ELSE 'CHAT' END,
             CASE o_orderkey % 4 WHEN 0 THEN 'PREPAID' WHEN 1 THEN 'POSTPAID'
                  WHEN 2 THEN 'ENTERPRISE' ELSE 'FAMILY PLAN' END,
             CAST(o_orderkey % 580 + 20 AS VARCHAR),
             CAST(o_orderkey % 100 + 10 AS VARCHAR),
             'RESOLVED',
             CAST(o_orderkey % 2 AS VARCHAR),
             'SELF-HELP OPTION',
             CASE o_orderkey % 5 WHEN 0 THEN {shifted_first} WHEN 1 THEN 'BAD'
                  WHEN 2 THEN 'NEUTRAL' WHEN 3 THEN 'GOOD'
                  ELSE 'BEST' END)) AS source_hash_key,
         CAST({load_id} AS BIGINT) AS data_load_id
  FROM orders WHERE o_orderkey >= {lo} AND o_orderkey < {hi}"""


def _two_load_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared two-load AT&T mart: load 1 over order keys [0,500),
    then an overlapping shifted load 2 over [250,750) merged on top.
    One definition — three oracle-gated queries (incremental, as-of
    snapshot, vacuum) must all test the SAME mart, so the scenario
    cannot drift between copies."""
    orders = load(spark, sf_dir, "orders")
    dims = _seed_dims(spark)
    staged1 = csv_transform(_att_feed(orders, 0, 500, shift=False), dims, 61)
    mart1, _ = run_load(empty_mart(spark), staged1, _T1_2L, source_id=3,
                        dense_ids=True, surrogate_offset=0)
    mart1 = mart1.localCheckpoint(eager=False)
    staged2 = csv_transform(_att_feed(orders, 250, 750, shift=True), dims, 62)
    mart2, _ = run_load(mart1, staged2, _T2_2L, source_id=3, dense_ids=True)
    return mart2


@_q("etl_csv_two_load_incremental", f"""
WITH s1 AS ({_att_staged_sql(0, 500, False, 61)}),
s2 AS ({_att_staged_sql(250, 750, True, 62)}),
load1 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id, s1.*,
         1 AS is_valid_data, 1 AS active_flag,
         TIMESTAMP '{_T1_2L}' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM s1),
routed AS (
  SELECT s2.*, l.source_hash_key AS old_hash
  FROM s2 LEFT JOIN load1 l USING (ssi)),
arrivals AS (
  SELECT * FROM routed WHERE old_hash IS NULL OR old_hash <> source_hash_key),
survivors AS (
  SELECT * FROM load1 WHERE ssi NOT IN (SELECT ssi FROM arrivals)),
expired AS (
  SELECT csd_id, ssi, agent_id, interaction_date, support_area_id,
         interaction_status, interaction_type, customer_type_id, handle_time,
         work_time, first_contact_resolution, query_status, solution_type,
         customer_rating, source_hash_key, data_load_id, is_valid_data,
         0 AS active_flag, start_date,
         TIMESTAMP '{_T2_2L}' AS end_date
  FROM load1 WHERE ssi IN (SELECT ssi FROM arrivals)),
fresh AS (
  SELECT (SELECT MAX(csd_id) FROM load1) + ROW_NUMBER() OVER (ORDER BY ssi)
           AS csd_id,
         ssi, agent_id, interaction_date, support_area_id,
         interaction_status, interaction_type, customer_type_id, handle_time,
         work_time, first_contact_resolution, query_status, solution_type,
         customer_rating, source_hash_key, data_load_id,
         1 AS is_valid_data, 1 AS active_flag,
         TIMESTAMP '{_T2_2L}' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM arrivals)
SELECT csd_id, 3 AS source_id, ssi, agent_id, interaction_date,
       support_area_id, interaction_status, interaction_type,
       customer_type_id, handle_time, work_time, first_contact_resolution,
       query_status, solution_type, customer_rating, source_hash_key,
       data_load_id, is_valid_data, active_flag, start_date, end_date
FROM (SELECT csd_id, ssi, agent_id, interaction_date, support_area_id,
             interaction_status, interaction_type, customer_type_id,
             handle_time, work_time, first_contact_resolution, query_status,
             solution_type, customer_rating, source_hash_key, data_load_id,
             is_valid_data, active_flag, start_date, end_date FROM survivors
      UNION ALL SELECT * FROM expired
      UNION ALL SELECT * FROM fresh)
""")
def etl_csv_two_load_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mart_lower(_two_load_mart(spark, sf_dir))


# --- single-pass audit via the Observation API ------------------------------
# The A9 audit row computed as a SIDE-EFFECT of the action that consumes
# the data (here a noop sink standing in for the mart write) — zero
# extra scan, where load_audit_metrics costs a dedicated aggregation
# pass. The returned 1-row DataFrame is built from the observation's
# driver-side metric values (bounded: one scalar per metric).

@_q("observed_load_audit", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_qty,
       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 100)
            AS BIGINT) AS price_cents
FROM lineitem WHERE l_orderkey < 5000
""")
def observed_load_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_etl_project_spark.operators.audit import observed_audit

    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < 5000))
    observed, obs = observed_audit(li, {
        "n_rows": F.count(F.lit(1)),
        "n_high_qty": F.sum(F.when(F.col("l_quantity") >= 30, 1)
                             .otherwise(0)).cast("long"),
        "price_cents": F.floor(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) * 100)
            .cast("long"),
    })
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    return seed_df(spark,
                   [(m["n_rows"], m["n_high_qty"], m["price_cents"])],
                   "n_rows long, n_high_qty long, price_cents long")


# --- SCD2 time travel: AS OF between the two loads ---------------------------
# The snapshot at a t with load1 <= t < load2 must reconstruct EXACTLY
# the post-load-1 mart: survivors still open, rows later expired by
# load 2 are visible because their END_DATE (= load-2 ts) lies after t,
# and load-2 fresh rows are excluded by START_DATE. The oracle is
# literally the load1 CTE — time travel == the historical state, not a
# re-derivation.

@_q("scd2_asof_snapshot", f"""
WITH s1 AS ({_att_staged_sql(0, 500, False, 61)}),
load1 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id, s1.*,
         1 AS is_valid_data, 1 AS active_flag,
         TIMESTAMP '{_T1_2L}' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM s1)
SELECT csd_id, 3 AS source_id, ssi, agent_id, interaction_date,
       support_area_id, interaction_status, interaction_type,
       customer_type_id, handle_time, work_time, first_contact_resolution,
       query_status, solution_type, customer_rating, source_hash_key,
       data_load_id, is_valid_data, active_flag, start_date, end_date
FROM load1
""")
def scd2_asof_snapshot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_etl_project_spark.operators.scd2 import asof_snapshot

    mart2 = _two_load_mart(spark, sf_dir)
    return _mart_lower(asof_snapshot(mart2, "2024-05-15 00:00:00"))


# --- SCD2 history vacuum -----------------------------------------------------
# Retention pass over the two-load mart with the horizon ABOVE load 2's
# expiry stamp: the load-2-expired versions drop, open rows and fresh
# history survive. The oracle applies the same end>=horizon predicate
# to its independently-built mart — proving the vacuum keeps exactly
# the AS-OF-reconstructible set for the retention window.

@_q("scd2_vacuum_expired", f"""
WITH s1 AS ({_att_staged_sql(0, 500, False, 61)}),
s2 AS ({_att_staged_sql(250, 750, True, 62)}),
load1 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY ssi) AS csd_id, s1.*,
         1 AS is_valid_data, 1 AS active_flag,
         TIMESTAMP '{_T1_2L}' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM s1),
routed AS (
  SELECT s2.*, l.source_hash_key AS old_hash
  FROM s2 LEFT JOIN load1 l USING (ssi)),
arrivals AS (
  SELECT * FROM routed WHERE old_hash IS NULL OR old_hash <> source_hash_key),
survivors AS (
  SELECT * FROM load1 WHERE ssi NOT IN (SELECT ssi FROM arrivals)),
fresh AS (
  SELECT (SELECT MAX(csd_id) FROM load1) + ROW_NUMBER() OVER (ORDER BY ssi)
           AS csd_id,
         ssi, agent_id, interaction_date, support_area_id,
         interaction_status, interaction_type, customer_type_id, handle_time,
         work_time, first_contact_resolution, query_status, solution_type,
         customer_rating, source_hash_key, data_load_id,
         1 AS is_valid_data, 1 AS active_flag,
         TIMESTAMP '{_T2_2L}' AS start_date,
         TIMESTAMP '2099-12-31 00:00:00' AS end_date
  FROM arrivals)
SELECT csd_id, 3 AS source_id, ssi, agent_id, interaction_date,
       support_area_id, interaction_status, interaction_type,
       customer_type_id, handle_time, work_time, first_contact_resolution,
       query_status, solution_type, customer_rating, source_hash_key,
       data_load_id, is_valid_data, active_flag, start_date, end_date
FROM (SELECT csd_id, ssi, agent_id, interaction_date, support_area_id,
             interaction_status, interaction_type, customer_type_id,
             handle_time, work_time, first_contact_resolution, query_status,
             solution_type, customer_rating, source_hash_key, data_load_id,
             is_valid_data, active_flag, start_date, end_date FROM survivors
      UNION ALL SELECT * FROM fresh)
""")
def scd2_vacuum_expired_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_etl_project_spark.operators.scd2 import vacuum_expired

    mart2 = _two_load_mart(spark, sf_dir)
    return _mart_lower(vacuum_expired(mart2, "2024-07-01 00:00:00"))
