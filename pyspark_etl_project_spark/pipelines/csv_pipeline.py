"""AT&T CSV pipeline (SOURCE_ID=3): the reference's
ETL/CSV_Batch_Processing.py re-expressed distributed.

Step trace vs reference (§3.1): scan(A1) → keep-latest dedup(E1, file
position as the deterministic tiebreaker) → raw-column hash(H1,
pre-normalization — CSV hashes raw strings, unlike JSON) → key
prefix(H2) → normalize(H3 MMddyyyyHHmmss, H11 rating words, B7 renames)
→ dim joins(C4) → validity(H10) → staged select(B2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.hashing import row_fingerprint, source_system_identifier
from pyspark_etl_project_spark.functions.normalize import rating_words_to_score
from pyspark_etl_project_spark.operators.dedup import keep_latest
from pyspark_etl_project_spark.pipelines.common import attach_dimension_ids, finalize_staged
from pyspark_etl_project_spark.schemas import CSV_TICKETS_SCHEMA

SOURCE_NAME = "AT&T"
SOURCE_ID = 3

_RAW_COLS = [f.name for f in CSV_TICKETS_SCHEMA.fields]


def csv_transform(df: DataFrame, dims: dict[str, DataFrame],
                  data_load_id: int) -> DataFrame:
    """Raw CSV frame (with _ingest_order) → staged mart-shaped batch."""
    deduped = keep_latest(df, keys="TICKET_IDENTIFIER", order_by="_ingest_order")
    hashed = (deduped
              .withColumn("SOURCE_HASH_KEY", row_fingerprint(_RAW_COLS))
              .withColumn("SOURCE_SYSTEM_IDENTIFIER",
                          source_system_identifier(SOURCE_NAME, "TICKET_IDENTIFIER")))
    normalized = (hashed
                  .withColumn("INTERACTION_DATE",
                              F.to_timestamp("DATE_OF_CALL", "MMddyyyyHHmmss"))
                  .withColumn("INTERACTION_STATUS", F.col("CALL_STATUS"))
                  .withColumn("INTERACTION_TYPE", F.col("CALL_TYPE"))
                  .withColumn("HANDLE_TIME", F.col("DURATION"))
                  .withColumn("FIRST_CONTACT_RESOLUTION",
                              F.col("RESOLVED_IN_FIRST_CONTACT"))
                  .withColumn("QUERY_STATUS", F.col("TICKET_STATUS"))
                  .withColumn("SOLUTION_TYPE", F.col("RESOLUTION_CATEGORY"))
                  .withColumn("CUSTOMER_RATING", rating_words_to_score("RATING")))
    looked_up = attach_dimension_ids(normalized, dims, SOURCE_ID,
                                     agent_key="AGENT_NAME",
                                     area_key="SUPPORT_CATEGORY",
                                     ctype_key="TYPE_OF_CUSTOMER")
    return finalize_staged(looked_up, SOURCE_ID, data_load_id)
