"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no event-time/stateful surface (SURVEY.md §2.J4 —
its only state is a high-watermark id), so this is a beyond-reference
extension: per-key running aggregates whose state genuinely carries
across micro-batches (the driver query splits the feed into multiple
files and forces maxFilesPerTrigger=1, so batch 2 sees batch 1's
state).

Only integer-exact metrics (counts, max ids) live in state — float
accumulation across batches would drift from the SQL oracle.

Scale notes: state is per-group (user) and fixed-size (two longs), so
the state store grows with distinct keys, not events; Arrow batches
bound executor memory; the groupBy is the one shuffle. With event-time
bounds, add a GroupStateTimeout to evict idle keys — unbounded NoTimeout
is only safe for bounded key domains like this one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, max_event_id long"
_STATE_SCHEMA = "n long, mx long"


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (event count, max event id), emitted once per
    micro-batch per active key — the streaming form of
    ``GROUP BY user_id`` whose latest emission equals the batch answer."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            bmx = int(pdf["event_id"].max())
            mx = bmx if mx is None or bmx > mx else mx
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_event_id": [mx]})

    return (stream.groupBy("user_id")
            .applyInPandasWithState(update, RUNNING_TOTALS_SCHEMA,
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def latest_emission_per_key(mem_table: DataFrame,
                            key: str = "user_id") -> DataFrame:
    """Collapse the update-mode emission log to each key's final state.
    The tracked metrics are monotone, so max == latest."""
    from pyspark.sql import functions as F

    return (mem_table.groupBy(key)
            .agg(F.max("n_events").alias("n_events"),
                 F.max("max_event_id").alias("max_event_id")))


def multi_batch_file_stream(spark: Any, batches: list[DataFrame],
                            schema_ddl: str) -> DataFrame:
    """Stage each DataFrame as one parquet file in a watch dir and read
    it back as a stream with maxFilesPerTrigger=1 — a deterministic
    multi-micro-batch source for exercising cross-batch state."""
    import glob
    import os
    import shutil
    import tempfile

    watch = tempfile.mkdtemp(prefix="stateful_stream_")
    for i, df in enumerate(batches):
        staging = os.path.join(watch, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(watch, f"batch{i}.parquet"))
        shutil.rmtree(staging)
    return (spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", 1).parquet(watch))


TWS_TOTALS_SCHEMA = ("user_id long, n_events long, cents_sum long, "
                     "max_event_id long")


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """The transformWithStateInPandas form of per-key running totals —
    Spark 4's arbitrary-state API (typed ValueState owned by a handle,
    explicit time mode, timer support) vs the applyInPandasWithState
    flavor above. Adds an integer-cents running sum: only integer-exact
    metrics live in state, so replays converge to the batch answer.

    Requires the RocksDB state store provider (the API's backing store)
    AND the python `protobuf` package — transformWithState runs a
    Python driver worker speaking protobuf to the JVM state server, so
    environments without `google.protobuf` fail at stream start with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (this container has
    no protobuf and no installer; the test suite skips accordingly, the
    applyInPandasWithState operator above is the runnable-here
    equivalent). State per key is one fixed-width tuple, so the store
    scales with distinct keys, not events. Input rows must carry
    (user_id, event_id, cents)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType([StructField("n", LongType()),
                               StructField("cents", LongType()),
                               StructField("mx", LongType())])

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                n, cents, mx = self._state.get()
            else:
                n, cents, mx = 0, 0, None
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                cents += int(pdf["cents"].sum())
                bmx = int(pdf["event_id"].max())
                mx = bmx if mx is None or bmx > mx else mx
            self._state.update((n, cents, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "cents_sum": [cents], "max_event_id": [mx]})

        def close(self) -> None:
            pass

    return (stream.groupBy("user_id")
            .transformWithStateInPandas(_Totals(), TWS_TOTALS_SCHEMA,
                                        "Update", "None"))


def running_user_totals_apws(stream: DataFrame) -> DataFrame:
    """applyInPandasWithState twin of ``running_user_totals_tws`` —
    byte-identical output contract (user_id, n_events, cents_sum,
    max_event_id), same integer-exact state, no protobuf dependency.
    Exists so the running-totals contract is asserted even where
    transformWithState's Python worker can't start (no google.protobuf
    in this container); on protobuf-equipped clusters the TWS form is
    preferred (typed state handle, timers, TTL)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        n, cents, mx = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            bmx = int(pdf["event_id"].max())
            mx = bmx if mx is None or bmx > mx else mx
        state.update((n, cents, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "cents_sum": [cents], "max_event_id": [mx]})

    return (stream.groupBy("user_id")
            .applyInPandasWithState(update, TWS_TOTALS_SCHEMA,
                                    "n long, cents long, mx long",
                                    "update", GroupStateTimeout.NoTimeout))


def tws_available() -> bool:
    """Whether transformWithStateInPandas can start here: its Python
    state worker speaks protobuf to the JVM state server, so the API
    is environment-gated on ``google.protobuf`` (absent in some
    containers — stream start would fail with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


def running_user_totals_state(stream: DataFrame) -> DataFrame:
    """Environment-selecting front door for the per-key running-totals
    operator: the transformWithStateInPandas arm (typed state handle,
    timers, TTL) auto-activates wherever python-protobuf is present,
    and the applyInPandasWithState twin — byte-identical output
    contract — carries environments without it. Callers get the best
    runnable implementation without probing the environment
    themselves; both arms are asserted against the same batch GROUP BY
    in tests/test_extensions.py."""
    return (running_user_totals_tws(stream) if tws_available()
            else running_user_totals_apws(stream))
