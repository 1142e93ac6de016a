"""Seed dimension tables, mirroring the reference's DML seeds
(/root/reference/Setup/SQL_DML_Script.sql:1-499) in reduced form —
including the intentional duplicate customer-type rows (PROMO-SEEKER,
LONG-TERM CUSTOMER, DML:425-456) that dimension prep must collapse via
DISTINCT + newest-START_DATE (ETL/DB_Lookup.py:48-54).

SOURCE ids follow CSD_SOURCES: AMAZON=1, UBER=2, AT&T=3 (DML:1-19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_project_spark.schemas import (
    AGENTS_SCHEMA,
    CUSTOMER_TYPES_SCHEMA,
    SUPPORT_AREAS_SCHEMA,
)

_T0 = "2020-01-01 00:00:00"
_T1 = "2021-01-01 00:00:00"
_OPEN = "2099-12-31 00:00:00"

SUPPORT_AREAS = {
    1: ["ORDER ISSUES", "PAYMENTS", "RETURNS & REFUNDS", "PRIME MEMBERSHIP",
        "MARKETPLACE & THIRD-PARTY SELLERS"],
    2: ["RIDE ISSUES", "DRIVER FEEDBACK", "FARE DISPUTES", "ACCOUNT & APP",
        "SAFETY CONCERNS"],
    3: ["BILLING", "NETWORK COVERAGE", "DEVICE SUPPORT", "PLAN CHANGES",
        "INTERNATIONAL ROAMING"],
}

AGENTS = {
    1: [("AMZ-AGENT-%02d" % i) for i in range(1, 6)],
    2: [("UBR-AGENT-%02d" % i) for i in range(1, 6)],
    3: [("ATT-AGENT-%02d" % i) for i in range(1, 6)],
}

CUSTOMER_TYPES = {
    1: ["REGULAR", "PRIME", "BUSINESS", "PROMO-SEEKER"],
    2: ["RIDER", "DRIVER", "UBER-ONE", "LONG-TERM CUSTOMER"],
    3: ["PREPAID", "POSTPAID", "ENTERPRISE", "FAMILY PLAN"],
}


def seed_support_areas(spark: SparkSession) -> DataFrame:
    rows, i = [], 1
    for sid, names in SUPPORT_AREAS.items():
        for n in names:
            rows.append((i, n, sid, 1, _T0, _OPEN))
            i += 1
    return _with_scd(spark, rows, SUPPORT_AREAS_SCHEMA)


def seed_agents(spark: SparkSession) -> DataFrame:
    rows, i = [], 1
    for sid, codes in AGENTS.items():
        for c in codes:
            rows.append((i, f"First{i}", None, f"Last{i}", c, sid, 1, _T0, _OPEN))
            i += 1
    return _with_scd(spark, rows, AGENTS_SCHEMA)


def seed_customer_types(spark: SparkSession) -> DataFrame:
    rows, i = [], 1
    for sid, names in CUSTOMER_TYPES.items():
        for n in names:
            rows.append((i, n, sid, 1, _T0, _OPEN))
            i += 1
    # Intentional duplicates with a NEWER start date — the lookup must
    # pick these ids (top-1 by START_DATE), reproducing DML:425-456.
    rows.append((i, "PROMO-SEEKER", 1, 1, _T1, _OPEN)); i += 1
    rows.append((i, "LONG-TERM CUSTOMER", 2, 1, _T1, _OPEN)); i += 1
    # And an expired row that must be ignored entirely.
    rows.append((i, "PREPAID", 3, 0, _T1, _OPEN))
    return _with_scd(spark, rows, CUSTOMER_TYPES_SCHEMA)


def _with_scd(spark: SparkSession, rows: list, schema) -> DataFrame:
    ts_cols = {"START_DATE", "END_DATE"}
    ddl = ", ".join(
        f"{f.name} {'string' if f.name in ts_cols else f.dataType.simpleString()}"
        for f in schema.fields)
    # ONE slice, explicitly: the plain createDataFrame parallelizes a
    # 15-row seed into defaultParallelism (32) Python-RDD partitions,
    # and every scan of the dimension then pays 32 Python-worker
    # evaluations — measured at multiple SECONDS when a downstream
    # coalesce(1) serializes them into one task. A seed dimension is
    # one partition of driver-local rows by definition.
    from pyspark_etl_project_spark.functions.seedframe import seed_df
    plain = seed_df(spark, [tuple(r) for r in rows], ddl)
    for c in ts_cols:
        plain = plain.withColumn(c, F.col(c).cast("timestamp"))
    return plain
