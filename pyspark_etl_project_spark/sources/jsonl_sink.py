"""Custom batch SINK via the Python DataSource writer API (Spark 4) —
the write-side complement of sources/docsynth_source.py, completing the
engine's connector matrix (reader + writer, both pure-Python
extensions). `jsonlsink` streams each partition's rows to one JSONL
file and reports per-task row counts through WriterCommitMessages,
which commit() folds into a `_SUCCESS`-style manifest.

Scale design: each task writes exactly one file named by its partition
id (deterministic on retry — a re-attempted task OVERWRITES its own
file rather than duplicating rows) while the TEMP file carries the
task ATTEMPT id, so two concurrent attempts of one partition
(speculation, zombie + retry) never share a tmp path — each stages
privately and the atomic rename publishes a complete file either way,
the idempotence a speculative 1000-executor write needs. The driver
sees only k commit messages
(one integer per task), never data. JSON encoding is json.dumps with
sort_keys for byte-stable output. Each committed write REPLACES the
directory's content — commit() removes part files the new manifest
does not list (a narrower re-write would otherwise leave stale
wider-write files for glob consumers), the manifest is the
authoritative file list, and writer() therefore REJECTS
mode('append'): replace-behind-an-append-API would be silent data
loss. A shared filesystem is assumed, as for any production sink; the
local[] test rig satisfies that trivially. The roundtrip is
oracle-gated (`jsonl_sink_roundtrip`).

Reference parity note: the reference lands every feed through
driver-side pandas `to_sql` row loops (ETL/CSV_Batch_Processing.py
:311-324); this is the executor-parallel replacement surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, partition_id: int, n_rows: int):
        self.partition_id = partition_id
        self.n_rows = n_rows


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonlsink").option("path", dir)
    .mode("overwrite").save()`"""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> "JsonlSinkWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonlsink requires .option('path', ...)")
        # Every committed write REPLACES the directory (commit() sweeps
        # part files not in the new manifest) — accepting mode('append')
        # would silently delete previously committed data behind an API
        # that promises accumulation. Demand the mode that matches.
        if not overwrite:
            raise ValueError(
                "jsonlsink replaces the target directory on commit; "
                "use .mode('overwrite') — append semantics are not "
                "supported")
        return JsonlSinkWriter(path, [f.name for f in schema.fields])


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def write(self, iterator) -> JsonlCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        # Attempt-unique temp name: two live attempts of the same
        # partition (speculative execution, zombie task + retry) must not
        # truncate/interleave one shared tmp file. Each attempt writes
        # its own tmp; the atomic rename publishes whichever finishes —
        # both attempts carry identical partition data, so last-writer-
        # wins is safe.
        tmp = f"{out}.{ctx.taskAttemptId()}.tmp"
        n = 0
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                for row in iterator:
                    rec = {c: row[i] for i, c in enumerate(self.columns)}
                    fh.write(json.dumps(rec, sort_keys=True,
                                        default=str) + "\n")
                    n += 1
            os.replace(tmp, out)  # atomic per-task publish; retries overwrite
        except BaseException:
            # A failed attempt must not strand its attempt-unique tmp —
            # the retry gets a NEW attempt id and would never reuse it.
            # (Killed/zombie attempts can't run this; commit()/abort()
            # sweep whatever they leave behind.)
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return JsonlCommit(pid, n)

    def _sweep_tmps(self) -> None:
        """Remove stranded attempt tmps. Safe at job end: every live
        task has finished (speculative duplicates are killed before the
        job-level commit/abort), so any remaining *.tmp is a dead
        attempt's leftover staging file."""
        import glob

        for p in glob.glob(os.path.join(self.path, "part-*.jsonl.*.tmp")):
            try:
                os.remove(p)
            except OSError:
                pass

    def commit(self, messages) -> None:
        self._sweep_tmps()
        files = sorted(
            f"part-{m.partition_id:05d}.jsonl" for m in messages
            if m is not None)
        manifest = {"files": files,
                    "total_rows": sum(m.n_rows for m in messages
                                      if m is not None)}
        # The manifest is AUTHORITATIVE: a previous write with more
        # partitions leaves part files this job did not touch, and a
        # glob consumer would read a mix of old and new data (8-file
        # job followed by a 4-file job -> part-00004..7 are stale).
        # Every committed write therefore owns the directory: part
        # files not in this manifest are removed.
        import glob

        keep = set(files)
        for p in glob.glob(os.path.join(self.path, "part-*.jsonl")):
            if os.path.basename(p) not in keep:
                try:
                    os.remove(p)
                except OSError:
                    pass
        with open(os.path.join(self.path, "_MANIFEST.json"), "w",
                  encoding="utf-8") as fh:
            json.dump(manifest, fh, sort_keys=True)

    def abort(self, messages) -> None:
        self._sweep_tmps()
        for m in messages:
            if m is None:
                continue
            p = os.path.join(self.path, f"part-{m.partition_id:05d}.jsonl")
            if os.path.exists(p):
                os.remove(p)
