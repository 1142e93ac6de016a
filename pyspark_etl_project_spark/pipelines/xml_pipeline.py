"""UBER XML pipeline (SOURCE_ID=2): the reference's
ETL/XML_Batch_Processing.py re-expressed distributed.

Fidelity notes (§3.3): the hash INCLUDES TIME_STAMP (a generation-time
field, XML:163-168) so an identical re-delivered record hashes
differently and routes UPDATE, not DUPLICATE — replicated as-is.
Durations arrive as 'H:MM:SS' and become seconds via column arithmetic
(I4 without the Python UDF). Dedup orders by ARCHIVE_ID (the archive's
autoincrement — real arrival order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.hashing import row_fingerprint, source_system_identifier
from pyspark_etl_project_spark.functions.normalize import duration_to_seconds, true_false_to_flag
from pyspark_etl_project_spark.operators.dedup import keep_latest
from pyspark_etl_project_spark.pipelines.common import attach_dimension_ids, finalize_staged
from pyspark_etl_project_spark.schemas import XML_RECORD_FIELDS

SOURCE_NAME = "UBER"
SOURCE_ID = 2


def xml_transform(df: DataFrame, dims: dict[str, DataFrame],
                  data_load_id: int) -> DataFrame:
    """Parsed XML frame (14 string cols + ARCHIVE_ID) → staged batch."""
    deduped = keep_latest(df, keys="SUPPORT_IDENTIFIER", order_by="ARCHIVE_ID")
    hashed = (deduped
              .withColumn("SOURCE_HASH_KEY", row_fingerprint(XML_RECORD_FIELDS))
              .withColumn("SOURCE_SYSTEM_IDENTIFIER",
                          source_system_identifier(SOURCE_NAME, "SUPPORT_IDENTIFIER")))
    normalized = (hashed
                  .withColumn("INTERACTION_DATE",
                              F.to_timestamp("DATE_OF_INTERACTION", "yyyyMMddHHmmss"))
                  .withColumn("INTERACTION_STATUS", F.col("STATUS_OF_INTERACTION"))
                  .withColumn("INTERACTION_TYPE", F.col("TYPE_OF_INTERACTION"))
                  .withColumn("HANDLE_TIME", duration_to_seconds("CONTACT_DURATION"))
                  .withColumn("WORK_TIME",
                              duration_to_seconds("AFTER_CONTACT_WORK_TIME"))
                  .withColumn("FIRST_CONTACT_RESOLUTION",
                              true_false_to_flag("FIRST_CONTACT_SOLVE"))
                  .withColumn("QUERY_STATUS", F.col("INCIDENT_STATUS"))
                  .withColumn("SOLUTION_TYPE", F.col("TYPE_OF_RESOLUTION"))
                  .withColumn("CUSTOMER_RATING",
                              F.col("SUPPORT_RATING").cast("int")))
    looked_up = attach_dimension_ids(normalized, dims, SOURCE_ID,
                                     agent_key="AGENT_CODE",
                                     area_key="CONTACT_REGARDING",
                                     ctype_key="CUSTOMER_TYPE")
    return finalize_staged(looked_up, SOURCE_ID, data_load_id)
