"""Central registry: every implemented operator's (spark query, oracle SQL)
pair, merged from the plan modules. Consumed by __spark_entry__.py.

Ordering is *coverage-aware*: external correctness gates check queries in
registry insertion order and may cap how many they run per round, so
queries that have never produced a green gate row (never checked, or
checked and failed) sort first, and green queries sort oldest-green
first. Over successive rounds every query rotates through the checked
window — no query family stays permanently unverified.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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


def _latest_green_round() -> dict[str, int]:
    """Map query name -> most recent round in which the external gate
    recorded a full value-level match. Missing/failed -> absent."""
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
            with open(path) as f:
                results = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in results.items():
            if not isinstance(row, dict):
                continue
            # Full value-level match, OR a rows-only pass for a query
            # that has no oracle twin (non-SQL-expressible ops get the
            # driver's weaker rows-only check; hash_match is absent/None
            # there, and such a query must not pin the never-green-first
            # slot forever). A recorded hash FAILURE stays red.
            hm = row.get("hash_match")
            if hm is True or (hm is None and row.get("rows_match") is True):
                green[name] = max(green.get(name, 0), rnd)
    return green


def _ordered(mapping_attr: str) -> dict:
    raw: dict = {}
    for m in _modules():
        raw.update(getattr(m, mapping_attr))
    green = _latest_green_round()
    # Stable sort: never-green first (priority 0), then by oldest green
    # round; insertion order breaks ties.
    names = sorted(raw, key=lambda n: green.get(n, -1))
    return {n: raw[n] for n in names}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered("QUERIES")


def all_oracle_sql() -> dict[str, str]:
    return _ordered("ORACLE")
