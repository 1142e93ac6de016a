"""Central registry: every implemented operator's (spark query, oracle SQL)
pair, merged from the plan modules. Consumed by __spark_entry__.py.

Ordering is *coverage-aware* AND *code-change-aware*: external
correctness gates check queries in registry insertion order and may cap
how many they run per round, so

1. queries that have never produced a green gate row (never checked, or
   checked and failed) sort first;
2. queries whose IMPLEMENTATION changed since their last green gate row
   sort with them (a green row proves the code as it was THEN — a
   rewrite invalidates the evidence, so the query must re-verify before
   the untouched backlog rotates through);
3. green, unchanged queries sort oldest-green first.

"Changed" is detected by fingerprint: sha256 over the query function's
source, its oracle SQL, and the contents of every engine module the
function references (dotted imports in the source + module-level names
the code object resolves through). The fingerprint each green query had
AT GATE TIME is recorded in GREEN_HASHES.json at the repo root by
tools/update_green_hashes.py — run it at ROUND START, before editing
anything, so the recorded hash matches what the previous round's gate
actually verified. A query with no recorded hash, or whose current
fingerprint differs, is treated like never-green. Missing ledger
degrades gracefully to the old oldest-green-first rotation (everything
green is then "changed", which only means the rotation re-verifies more
than strictly needed — the safe direction).
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GREEN_HASHES_PATH = os.path.join(_REPO_ROOT, "GREEN_HASHES.json")

_PKG = "pyspark_etl_project_spark"
_MODULE_REF = re.compile(rf"{_PKG}(?:\.\w+)+")


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


_file_hash_cache: dict[str, str] = {}


def _file_hash(path: str) -> str:
    h = _file_hash_cache.get(path)
    if h is None:
        try:
            with open(path, "rb") as f:
                h = hashlib.sha256(f.read()).hexdigest()
        except OSError:
            h = "unreadable"
        _file_hash_cache[path] = h
    return h


def _watched_files(fn) -> list[str]:
    """Engine module files whose edits must invalidate this query's
    green evidence: every package module the function source imports
    with a dotted path (the plan files' function-local import
    convention), plus the defining module of every module-level name
    the code object references (top-level `from x import y` helpers
    like load/keep_latest/row_fingerprint). One level deep by design —
    the plan-visible surface, not the transitive closure."""
    files: set[str] = set()
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    mod_names = set(_MODULE_REF.findall(src))
    for name in getattr(fn, "__code__", None).co_names if hasattr(fn, "__code__") else []:
        obj = fn.__globals__.get(name)
        if obj is None:
            continue
        mod = obj.__name__ if inspect.ismodule(obj) else getattr(obj, "__module__", None)
        if isinstance(mod, str) and mod.startswith(_PKG):
            mod_names.add(mod)
    for mod in mod_names:
        m = sys.modules.get(mod)
        if m is None:
            # Function-local imports haven't executed at ordering time;
            # an unimported module would silently drop out of the
            # watched set (its edits then couldn't invalidate the green
            # evidence). These are all this package's own modules —
            # importing them here is safe and cheap.
            try:
                import importlib

                m = importlib.import_module(mod)
            except Exception:  # noqa: BLE001
                # Some modules have import-time requirements this
                # context can't meet (e.g. a live SparkSession). An
                # unwatchable module is skipped, not fatal — the
                # fingerprint simply doesn't extend to it, exactly the
                # pre-import behavior.
                continue
        f = getattr(m, "__file__", None)
        if f:
            files.add(f)
    return sorted(files)


def query_fingerprint(fn, oracle_sql: str | None) -> str:
    """Content fingerprint of a (query, oracle) pair: the function's
    own source, the oracle SQL, and the bytes of every watched engine
    module file. Any change to any part → different fingerprint →
    the rotation re-verifies the query before rotating elsewhere."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    h = hashlib.sha256()
    h.update(src.encode("utf-8"))
    h.update((oracle_sql or "").encode("utf-8"))
    for f in _watched_files(fn):
        h.update(os.path.basename(f).encode("utf-8"))
        h.update(_file_hash(f).encode("utf-8"))
    return h.hexdigest()


def _load_green_hashes() -> dict:
    try:
        with open(GREEN_HASHES_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _raw_maps() -> tuple[dict, dict]:
    queries: dict = {}
    oracle: dict = {}
    for m in _modules():
        queries.update(m.QUERIES)
        oracle.update(m.ORACLE)
    return queries, oracle


_order_cache: list[str] | None = None


def _order_names(queries: dict, oracle: dict) -> list[str]:
    # The ordering inputs (CORRECTNESS files, ledger, module sources)
    # are fixed for a process's lifetime, and the entry point calls
    # all_queries() AND all_oracle_sql() — without the cache each call
    # re-globs the gate history and re-fingerprints every green query.
    global _order_cache
    if _order_cache is not None and set(_order_cache) == set(queries):
        return _order_cache
    green = _latest_green_round()
    ledger = _load_green_hashes()

    def key(n: str) -> int:
        g = green.get(n, -1)
        if g < 0:
            return -1
        ent = ledger.get(n)
        if not isinstance(ent, dict):
            return -1
        if ent.get("hash") != query_fingerprint(queries[n], oracle.get(n)):
            return -1  # implementation changed since the recorded green
        return g

    # Stable sort: never-green and changed-since-green first (priority
    # -1), then by oldest green round; insertion order breaks ties.
    _order_cache = sorted(queries, key=key)
    return _order_cache


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries, oracle = _raw_maps()
    return {n: queries[n] for n in _order_names(queries, oracle)}


def all_oracle_sql() -> dict[str, str]:
    queries, oracle = _raw_maps()
    return {n: oracle[n] for n in _order_names(queries, oracle)
            if n in oracle}
