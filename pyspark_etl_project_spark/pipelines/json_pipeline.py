"""AMAZON JSON pipeline (SOURCE_ID=1): the reference's
ETL/JSON_Batch_Processing.py re-expressed distributed.

Fidelity notes (§3.2): CONTACT_DATE parses BEFORE hashing (the hash
input includes the typed timestamp — ordering differs from CSV which
hashes raw strings); WORK_TIME = TOTAL_TIME − INTERACTION_DURATION
(H13); YES/NO → 1/0 (H12); RATING floor(r/2) with the 1→0 quirk (H6);
dedup orders by the pickledb ingest id (real arrival order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.hashing import row_fingerprint, source_system_identifier
from pyspark_etl_project_spark.functions.normalize import rating_ten_to_five, yes_no_to_flag
from pyspark_etl_project_spark.operators.dedup import keep_latest
from pyspark_etl_project_spark.pipelines.common import attach_dimension_ids, finalize_staged
from pyspark_etl_project_spark.schemas import JSON_VALUE_SCHEMA

SOURCE_NAME = "AMAZON"
SOURCE_ID = 1

_VALUE_COLS = [f.name for f in JSON_VALUE_SCHEMA.fields]


def json_transform(df: DataFrame, dims: dict[str, DataFrame],
                   data_load_id: int) -> DataFrame:
    """Flattened JSON frame (value.* + _ingest_order) → staged batch."""
    typed = df.withColumn("CONTACT_DATE",
                          F.to_timestamp("CONTACT_DATE", "dd/MM/yyyy HH:mm:ss"))
    deduped = keep_latest(typed, keys="INTERACTION_ID", order_by="_ingest_order")
    hashed = (deduped
              .withColumn("SOURCE_HASH_KEY", row_fingerprint(_VALUE_COLS))
              .withColumn("SOURCE_SYSTEM_IDENTIFIER",
                          source_system_identifier(SOURCE_NAME, "INTERACTION_ID")))
    normalized = (hashed
                  .withColumn("INTERACTION_DATE", F.col("CONTACT_DATE"))
                  .withColumn("HANDLE_TIME", F.col("INTERACTION_DURATION"))
                  .withColumn("WORK_TIME",
                              F.col("TOTAL_TIME") - F.col("INTERACTION_DURATION"))
                  .withColumn("FIRST_CONTACT_RESOLUTION",
                              yes_no_to_flag("RESOLVED_IN_FIRST_CONTACT"))
                  .withColumn("QUERY_STATUS", F.col("STATUS_OF_CUSTOMER_INCIDENT"))
                  .withColumn("CUSTOMER_RATING", rating_ten_to_five("RATING")))
    looked_up = attach_dimension_ids(normalized, dims, SOURCE_ID,
                                     agent_key="AGENT_PSEUDO_NAME",
                                     area_key="SUPPORT_CATEGORY",
                                     ctype_key="TYPE_OF_CUSTOMER")
    return finalize_staged(looked_up, SOURCE_ID, data_load_id)
