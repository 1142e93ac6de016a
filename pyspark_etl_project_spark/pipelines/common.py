"""Shared pipeline spine: stage → CDC route → SCD2 merge → audit.

This is the reference's per-pipeline duplicated block
(/root/reference/ETL/CSV_Batch_Processing.py:137-244 'data_transformer' +
:247-334 'upsert_table', duplicated in JSON:266-353 and XML:282-363)
factored once, fully distributed (no toPandas, no row loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.normalize import validity_flag
from pyspark_etl_project_spark.operators.audit import load_audit_metrics
from pyspark_etl_project_spark.operators.cdc import cdc_classify
from pyspark_etl_project_spark.operators.lookup import lookup_join, prepare_dimension
from pyspark_etl_project_spark.operators.scd2 import scd2_merge
from pyspark_etl_project_spark.schemas import MART_SCHEMA

# The 12 null-checked columns feeding IS_VALID_DATA
# (reference CSV:200-217).
VALIDITY_COLS = [
    "AGENT_ID", "INTERACTION_DATE", "SUPPORT_AREA_ID", "INTERACTION_STATUS",
    "INTERACTION_TYPE", "CUSTOMER_TYPE_ID", "HANDLE_TIME", "WORK_TIME",
    "FIRST_CONTACT_RESOLUTION", "QUERY_STATUS", "SOLUTION_TYPE",
    "CUSTOMER_RATING",
]

STAGED_COLS = [
    "SOURCE_ID", "SOURCE_SYSTEM_IDENTIFIER", "AGENT_ID", "INTERACTION_DATE",
    "SUPPORT_AREA_ID", "INTERACTION_STATUS", "INTERACTION_TYPE",
    "CUSTOMER_TYPE_ID", "HANDLE_TIME", "WORK_TIME",
    "FIRST_CONTACT_RESOLUTION", "QUERY_STATUS", "SOLUTION_TYPE",
    "CUSTOMER_RATING", "SOURCE_HASH_KEY", "DATA_LOAD_ID", "IS_VALID_DATA",
]


def empty_mart(spark: SparkSession) -> DataFrame:
    """Schema-typed empty mart (A5 semantics,
    reference ETL/CSV_Batch_Processing.py:34-43).

    Built as a provably-empty LocalRelation (one-row projection behind
    a literal-false filter) instead of ``createDataFrame([], schema)``:
    the latter is a LogicalRDD whose emptiness Catalyst cannot see, so
    a first load into a fresh mart paid the FULL merge machinery —
    keys-distinct + broadcast, anti/semi joins, three union branches —
    over provably zero rows. With a LocalRelation,
    PropagateEmptyRelation collapses all of it at optimization time and
    the first load plans as exactly the arrival branch (guide §2.4:
    remove shuffles the data cannot need). Schema (incl. nullability)
    is identical to MART_SCHEMA. (The typed-empty-seed A5 semantics
    remain gated by scan_filter_project, whose seed is seed_df's
    single-slice RDD since r17.)"""
    cols = [F.lit(None).cast(f.dataType).alias(f.name)
            for f in MART_SCHEMA.fields]
    return spark.range(1).select(*cols).filter(F.lit(False))


def attach_dimension_ids(df: DataFrame, dims: dict[str, DataFrame],
                         source_id: int,
                         agent_key: str, area_key: str,
                         ctype_key: str) -> DataFrame:
    """The three reference lookup UDFs (I1-I3) as broadcast joins (C4).
    Misses stay null and flow into IS_VALID_DATA."""
    agents = prepare_dimension(dims["agents"], "PSEUDO_CODE", "AGENT_ID", source_id)
    areas = prepare_dimension(dims["support_areas"], "SUPPORT_AREA_NAME",
                              "SUPPORT_AREA_ID", source_id)
    ctypes = prepare_dimension(dims["customer_types"], "CUSTOMER_TYPE_NAME",
                               "CUSTOMER_TYPE_ID", source_id)
    out = lookup_join(df, agents, agent_key, "PSEUDO_CODE", "AGENT_ID", "AGENT_ID")
    out = lookup_join(out, areas, area_key, "SUPPORT_AREA_NAME",
                      "SUPPORT_AREA_ID", "SUPPORT_AREA_ID")
    out = lookup_join(out, ctypes, ctype_key, "CUSTOMER_TYPE_NAME",
                      "CUSTOMER_TYPE_ID", "CUSTOMER_TYPE_ID")
    return out


def finalize_staged(df: DataFrame, source_id: int, data_load_id: int) -> DataFrame:
    """Validity flag + fixed staged projection (B2 select order)."""
    out = (df.withColumn("SOURCE_ID", F.lit(source_id).cast("int"))
             .withColumn("DATA_LOAD_ID", F.lit(data_load_id).cast("long"))
             .withColumn("IS_VALID_DATA", validity_flag(VALIDITY_COLS)))
    return out.select(*STAGED_COLS)


def run_load(mart: DataFrame, staged: DataFrame,
             run_ts: str, source_id: int | None = None,
             dense_ids: bool = False,
             surrogate_offset: int | None = None) -> tuple[DataFrame, DataFrame]:
    """CDC-route the staged batch against the active mart slice for its
    source, SCD2-merge the INSERT/UPDATE rows, return (new_mart, audit).

    Partition-pruning note: the historic slice filter (ACTIVE_FLAG=1 AND
    SOURCE_ID=n) hits the mart's SOURCE_ID partitioning; at 100 TB the
    scan reads one source's active rows, three columns. Pass source_id
    explicitly — deriving it from the batch would trigger an extra job
    over the whole staged plan.

    ``dense_ids`` defaults to False: sparse surrogate ids
    (monotonically_increasing_id + offset) preserve every SCD2 invariant
    except autoincrement *density* and skip dense_row_number's extra
    count pass + eager range repartition (~2 Spark jobs per load). Opt
    in when autoincrement-faithful ids are contractually required (the
    oracle-checked pipeline queries do, matching the reference's
    SQLite AUTOINCREMENT column).

    ``surrogate_offset``: persisted high-water surrogate (see
    watermark.save_surrogate_hwm) — skips the O(mart) MAX(CSD_ID) scan.
    """
    if source_id is None:
        row = staged.select("SOURCE_ID").first()
        source_id = row["SOURCE_ID"] if row else None
    historic = (mart.filter((F.col("ACTIVE_FLAG") == 1)
                            & (F.col("SOURCE_ID") == source_id))
                    .select(F.col("CSD_ID").alias("HISTORIC_CSD_ID"),
                            F.col("SOURCE_SYSTEM_IDENTIFIER").alias("HISTORIC_SSI"),
                            F.col("SOURCE_HASH_KEY").alias("HISTORIC_HASHKEY")))
    routed = cdc_classify(staged, historic)
    arrivals = routed.select(*STAGED_COLS)
    merged = scd2_merge(mart, arrivals, run_ts=run_ts, dense_ids=dense_ids,
                        surrogate_offset=surrogate_offset)
    audit = load_audit_metrics(arrivals, group_by=["SOURCE_ID", "DATA_LOAD_ID"])
    return merged, audit
