"""Regression guard for the events.ts parquet encoding.

The driver-side testdata generator has shipped events.ts both as
TIMESTAMP(NANOS) (round ≤3) and as plain timestamp[us] NTZ (round 4+).
Round 4 lost its entire bench because the engine only handled the nanos
encoding. This test writes the same rows BOTH ways through pyarrow and
asserts that the batch loader (plans/tables.load) and the streaming
ingest (streaming/ingest.stream_events) each produce identical,
2024-era timestamps for either physical encoding — so the next silent
regeneration can't zero a round again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark_etl_project_spark.plans import tables
from pyspark_etl_project_spark.streaming.ingest import (
    run_stream_to_memory, stream_events, windowed_event_agg)

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 7, 179575), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 2, 12, 30, 0, 500000), 11, "view", 2.0, "{}"),
    (3, dt.datetime(2024, 1, 30, 23, 57, 12, 194062), 10, "click", 0.5, "{}"),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table({
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS], pa.string()),
        "value": pa.array([r[4] for r in ROWS], pa.float64()),
        "props": pa.array([r[5] for r in ROWS], pa.string()),
    })
    # version 2.6 keeps TIMESTAMP(NANOS) as nanos instead of coercing.
    pq.write_table(table, path, version="2.6")


@pytest.fixture(scope="module", params=["us", "ns"])
def events_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    _write_events(str(d / "events.parquet"), request.param)
    return str(d)


def test_batch_load_normalizes_ts_to_2024(spark, events_dir):
    df = tables.load(spark, events_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == sorted(r[1] for r in ROWS)


def test_batch_load_ts_is_session_tz_independent(spark, events_dir):
    """The NTZ→timestamp normalization must yield the same epoch instants
    whatever the caller session's time zone — an external harness session
    may not be UTC, and a TZ-consulting cast would shift unix_micros /
    window alignment relative to the DuckDB oracle."""
    from pyspark.sql import functions as F

    want = sorted(int(r[1].replace(tzinfo=dt.timezone.utc).timestamp()
                      * 1_000_000) for r in ROWS)
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = tables.load(spark, events_dir, "events")
            got = sorted(r["m"] for r in
                         df.select(F.unix_micros("ts").alias("m")).collect())
            assert got == want, f"ts shifted under session TZ {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_stream_ingest_normalizes_ts_to_2024(spark, events_dir):
    s = stream_events(spark, events_dir)
    assert dict(s.dtypes)["ts"] == "timestamp"
    out = run_stream_to_memory(windowed_event_agg(s))
    starts = sorted(r["window"]["start"] for r in out.collect())
    assert starts[0] == dt.datetime(2024, 1, 1)
    assert starts[-1] == dt.datetime(2024, 1, 30)
