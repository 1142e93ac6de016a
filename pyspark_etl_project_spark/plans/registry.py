"""Central registry: every implemented operator's (spark query, oracle SQL)
pair, merged from the plan modules. Consumed by __spark_entry__.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from pyspark_etl_project_spark.plans import (
        analytics_plans,
        extensions,
        join_plans,
        parity,
        pipeline_plans,
        streaming_plans,
    )
    return [parity, extensions, streaming_plans, pipeline_plans, join_plans,
            analytics_plans]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLE)
    return out
