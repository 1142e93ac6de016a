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
    dims = {
        "agents": seed_agents(spark),
        "support_areas": seed_support_areas(spark),
        "customer_types": seed_customer_types(spark),
    }
    staged = csv_transform(feed, dims, data_load_id=42)
    mart, _audit = run_load(empty_mart(spark), staged, _RUN_TS, source_id=3)
    return mart.select(
        F.col("CSD_ID").alias("csd_id"), F.col("SOURCE_ID").alias("source_id"),
        F.col("SOURCE_SYSTEM_IDENTIFIER").alias("ssi"),
        F.col("AGENT_ID").alias("agent_id"),
        F.col("INTERACTION_DATE").alias("interaction_date"),
        F.col("SUPPORT_AREA_ID").alias("support_area_id"),
        F.col("INTERACTION_STATUS").alias("interaction_status"),
        F.col("INTERACTION_TYPE").alias("interaction_type"),
        F.col("CUSTOMER_TYPE_ID").alias("customer_type_id"),
        F.col("HANDLE_TIME").alias("handle_time"),
        F.col("WORK_TIME").alias("work_time"),
        F.col("FIRST_CONTACT_RESOLUTION").alias("first_contact_resolution"),
        F.col("QUERY_STATUS").alias("query_status"),
        F.col("SOLUTION_TYPE").alias("solution_type"),
        F.col("CUSTOMER_RATING").alias("customer_rating"),
        F.col("SOURCE_HASH_KEY").alias("source_hash_key"),
        F.col("DATA_LOAD_ID").alias("data_load_id"),
        F.col("IS_VALID_DATA").alias("is_valid_data"),
        F.col("ACTIVE_FLAG").alias("active_flag"),
        F.col("START_DATE").alias("start_date"),
        F.col("END_DATE").alias("end_date"))
