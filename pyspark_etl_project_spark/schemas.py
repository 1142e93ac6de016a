"""Explicit schemas for every source feed and the conformed mart.

Fidelity notes (citations into /root/reference/):
- CSV 13-col schema: ETL/CSV_Batch_Processing.py:49-65
- JSON nested {key, value:{13 fields}}: ETL/JSON_Batch_Processing.py:54-77
- XML 14 string fields: ETL/XML_Batch_Processing.py:112-129
- Mart contract (21 cols): Setup/SQL_DDL_Script.sql:136-163, populated
  select ETL/CSV_Batch_Processing.py:220-242
- Historic-mart slice (3 cols): ETL/CSV_Batch_Processing.py:36-42

Never infer schemas — fixed StructTypes, like the reference.
"""

from __future__ import annotations

from pyspark.sql import types as T

CSV_TICKETS_SCHEMA = T.StructType([
    T.StructField("TICKET_IDENTIFIER", T.IntegerType(), True),
    T.StructField("SUPPORT_CATEGORY", T.StringType(), True),
    T.StructField("AGENT_NAME", T.StringType(), True),
    T.StructField("DATE_OF_CALL", T.StringType(), True),
    T.StructField("CALL_STATUS", T.StringType(), True),
    T.StructField("CALL_TYPE", T.StringType(), True),
    T.StructField("TYPE_OF_CUSTOMER", T.StringType(), True),
    T.StructField("DURATION", T.IntegerType(), True),
    T.StructField("WORK_TIME", T.IntegerType(), True),
    T.StructField("TICKET_STATUS", T.StringType(), True),
    T.StructField("RESOLVED_IN_FIRST_CONTACT", T.IntegerType(), True),
    T.StructField("RESOLUTION_CATEGORY", T.StringType(), True),
    T.StructField("RATING", T.StringType(), True),
])

JSON_VALUE_SCHEMA = T.StructType([
    T.StructField("INTERACTION_ID", T.IntegerType(), True),
    T.StructField("SUPPORT_CATEGORY", T.StringType(), True),
    T.StructField("AGENT_PSEUDO_NAME", T.StringType(), True),
    T.StructField("CONTACT_DATE", T.StringType(), True),
    T.StructField("INTERACTION_STATUS", T.StringType(), True),
    T.StructField("INTERACTION_TYPE", T.StringType(), True),
    T.StructField("TYPE_OF_CUSTOMER", T.StringType(), True),
    T.StructField("INTERACTION_DURATION", T.IntegerType(), True),
    T.StructField("TOTAL_TIME", T.IntegerType(), True),
    T.StructField("STATUS_OF_CUSTOMER_INCIDENT", T.StringType(), True),
    T.StructField("RESOLVED_IN_FIRST_CONTACT", T.StringType(), True),
    T.StructField("SOLUTION_TYPE", T.StringType(), True),
    T.StructField("RATING", T.IntegerType(), True),
])

JSON_INTERACTIONS_SCHEMA = T.StructType([
    T.StructField("key", T.IntegerType(), True),
    T.StructField("value", JSON_VALUE_SCHEMA, True),
])

XML_RECORD_FIELDS = [
    "SUPPORT_IDENTIFIER", "CONTACT_REGARDING", "AGENT_CODE",
    "DATE_OF_INTERACTION", "STATUS_OF_INTERACTION", "TYPE_OF_INTERACTION",
    "CUSTOMER_TYPE", "CONTACT_DURATION", "AFTER_CONTACT_WORK_TIME",
    "INCIDENT_STATUS", "FIRST_CONTACT_SOLVE", "TYPE_OF_RESOLUTION",
    "SUPPORT_RATING", "TIME_STAMP",
]

XML_RECORDS_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in XML_RECORD_FIELDS]
)

# Stream archive bronze rows (Setup/SQL_DDL_Script.sql:167-171).
ARCHIVE_SCHEMA = T.StructType([
    T.StructField("ARCHIVE_ID", T.LongType(), False),
    T.StructField("STREAM_RECORD_ID", T.LongType(), False),
    T.StructField("STREAMING_DATA", T.StringType(), True),
])

# Historic active-mart slice used by the CDC join
# (ETL/CSV_Batch_Processing.py:36-42).
HISTORIC_SLICE_SCHEMA = T.StructType([
    T.StructField("HISTORIC_CSD_ID", T.LongType(), True),
    T.StructField("HISTORIC_SSI", T.StringType(), True),
    T.StructField("HISTORIC_HASHKEY", T.StringType(), True),
])

# Conformed mart (21 columns; timestamps typed instead of SQLite TEXT).
MART_COLUMNS = [
    "CSD_ID", "SOURCE_ID", "SOURCE_SYSTEM_IDENTIFIER", "AGENT_ID",
    "INTERACTION_DATE", "SUPPORT_AREA_ID", "INTERACTION_STATUS",
    "INTERACTION_TYPE", "CUSTOMER_TYPE_ID", "HANDLE_TIME", "WORK_TIME",
    "FIRST_CONTACT_RESOLUTION", "QUERY_STATUS", "SOLUTION_TYPE",
    "CUSTOMER_RATING", "SOURCE_HASH_KEY", "DATA_LOAD_ID", "IS_VALID_DATA",
    "ACTIVE_FLAG", "START_DATE", "END_DATE",
]

MART_SCHEMA = T.StructType([
    T.StructField("CSD_ID", T.LongType(), True),
    T.StructField("SOURCE_ID", T.IntegerType(), True),
    T.StructField("SOURCE_SYSTEM_IDENTIFIER", T.StringType(), True),
    T.StructField("AGENT_ID", T.IntegerType(), True),
    T.StructField("INTERACTION_DATE", T.TimestampType(), True),
    T.StructField("SUPPORT_AREA_ID", T.IntegerType(), True),
    T.StructField("INTERACTION_STATUS", T.StringType(), True),
    T.StructField("INTERACTION_TYPE", T.StringType(), True),
    T.StructField("CUSTOMER_TYPE_ID", T.IntegerType(), True),
    T.StructField("HANDLE_TIME", T.IntegerType(), True),
    T.StructField("WORK_TIME", T.IntegerType(), True),
    T.StructField("FIRST_CONTACT_RESOLUTION", T.IntegerType(), True),
    T.StructField("QUERY_STATUS", T.StringType(), True),
    T.StructField("SOLUTION_TYPE", T.StringType(), True),
    T.StructField("CUSTOMER_RATING", T.IntegerType(), True),
    T.StructField("SOURCE_HASH_KEY", T.StringType(), True),
    T.StructField("DATA_LOAD_ID", T.LongType(), True),
    T.StructField("IS_VALID_DATA", T.IntegerType(), True),
    T.StructField("ACTIVE_FLAG", T.IntegerType(), True),
    T.StructField("START_DATE", T.TimestampType(), True),
    T.StructField("END_DATE", T.TimestampType(), True),
])

# Dimension schemas (Setup/SQL_DDL_Script.sql:16-52; seeds SQL_DML_Script.sql).
AGENTS_SCHEMA = T.StructType([
    T.StructField("AGENT_ID", T.IntegerType(), False),
    T.StructField("FIRST_NAME", T.StringType(), True),
    T.StructField("MIDDLE_NAME", T.StringType(), True),
    T.StructField("LAST_NAME", T.StringType(), True),
    T.StructField("PSEUDO_CODE", T.StringType(), True),
    T.StructField("SOURCE_ID", T.IntegerType(), True),
    T.StructField("ACTIVE_FLAG", T.IntegerType(), True),
    T.StructField("START_DATE", T.TimestampType(), True),
    T.StructField("END_DATE", T.TimestampType(), True),
])

SUPPORT_AREAS_SCHEMA = T.StructType([
    T.StructField("SUPPORT_AREA_ID", T.IntegerType(), False),
    T.StructField("SUPPORT_AREA_NAME", T.StringType(), True),
    T.StructField("SOURCE_ID", T.IntegerType(), True),
    T.StructField("ACTIVE_FLAG", T.IntegerType(), True),
    T.StructField("START_DATE", T.TimestampType(), True),
    T.StructField("END_DATE", T.TimestampType(), True),
])

CUSTOMER_TYPES_SCHEMA = T.StructType([
    T.StructField("CUSTOMER_TYPE_ID", T.IntegerType(), False),
    T.StructField("CUSTOMER_TYPE_NAME", T.StringType(), True),
    T.StructField("SOURCE_ID", T.IntegerType(), True),
    T.StructField("ACTIVE_FLAG", T.IntegerType(), True),
    T.StructField("START_DATE", T.TimestampType(), True),
    T.StructField("END_DATE", T.TimestampType(), True),
])

# Load-audit row (CSD_DATA_LOADS, Setup/SQL_DDL_Script.sql:92-104).
AUDIT_SCHEMA = T.StructType([
    T.StructField("DATA_LOAD_ID", T.LongType(), False),
    T.StructField("SOURCE_ID", T.IntegerType(), True),
    T.StructField("TOTAL_UPSERT_COUNT", T.LongType(), True),
    T.StructField("VALID_COUNT", T.LongType(), True),
    T.StructField("INVALID_COUNT", T.LongType(), True),
    T.StructField("DATA_VALID_PERCENTAGE", T.DoubleType(), True),
])
