"""Structured Streaming ingest — replaces the reference's driver-side
poll loop (J1-J3, /root/reference/ETL/XML_Streaming.py:85-107: 10 s
REST poll + manual `increment_id > last` watermark + archive append).

Spark mapping:
- source offsets replace the hand-kept high-watermark (J2);
- `trigger(processingTime=...)` replaces `time.sleep(10)` (J1);
- `foreachBatch(scd2_merge)` gives idempotent at-least-once merge —
  re-delivered records collapse through the hash-CDC DUPLICATE class,
  same as the reference's archive replay (J3).

Tests drive a file source with processAllAvailable() (synchronous
drain); production swaps in kafka/rate sources — the plan is identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_stream_schema(events_path: str) -> tuple[T.StructType, bool]:
    """Build the readStream schema for the events parquet, sniffing the
    physical ``ts`` encoding once (driver-side, footer only). Generators
    have shipped both TIMESTAMP(NANOS) — which Spark only reads as long
    under nanosAsLong — and plain timestamp[us]. Returns (schema,
    ts_is_nanos_long): when True the caller must convert long-nanos →
    timestamp; when False ``ts`` is already a typed timestamp column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(events_path).field("ts").type
    nanos_as_long = (pa.types.is_int64(ts_type)
                     or (pa.types.is_timestamp(ts_type)
                         and ts_type.unit == "ns"))
    ts_field = (T.StructField("ts", T.LongType(), True) if nanos_as_long
                else T.StructField("ts", T.TimestampType(), True))
    schema = T.StructType([
        T.StructField("event_id", T.LongType(), True),
        ts_field,
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ])
    return schema, nanos_as_long


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table; ts normalized to
    microsecond timestamps like the batch loader (plans/tables.py).

    The file source requires a directory (it watches for new files), so
    the single parquet file is exposed through a temp dir symlink — the
    testdata itself is read-only."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    schema, nanos_as_long = _events_stream_schema(src)
    if nanos_as_long:
        # Mirror plans/tables.py:load — an externally-built session
        # (harness, notebook) reading TIMESTAMP(NANOS) parquet fails with
        # PARQUET_TYPE_ILLEGAL unless this runtime-settable conf is on.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    watch_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(watch_dir, "events.parquet"))
    raw = spark.readStream.schema(schema).parquet(watch_dir)
    if nanos_as_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def windowed_event_agg(stream: DataFrame,
                       window_len: str = "1 day",
                       watermark: str = "1 day") -> DataFrame:
    """Tumbling-window per-type counts + exact value cents. The decimal
    sum keeps the aggregate exact (cross-engine, and stable under
    retraction-free complete-mode output)."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window_len), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.floor(F.sum(F.col("value").cast("decimal(18,6)")) * 100)
                  .cast("long").alias("value_cents")))


def run_stream_to_memory(agg: DataFrame, name: str | None = None,
                         output_mode: str = "complete") -> DataFrame:
    """Drain the stream synchronously into an in-memory table and return
    it as a batch DataFrame (test/driver harness path)."""
    qname = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode(output_mode)
         .format("memory").queryName(qname).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.table(qname)


def foreach_batch_scd2(stream: DataFrame, mart_path: str, initial_mart: DataFrame,
                       run_ts: str, key: str = "SOURCE_SYSTEM_IDENTIFIER",
                       surrogate_col: str = "CSD_ID",
                       prepare=None,
                       num_buckets: int | None = 16,
                       partition_col: str | None = None,
                       reset: bool | None = None) -> None:
    """Merge each micro-batch into an SCD2 parquet mart. At-least-once
    file sink made idempotent by the merge (re-delivered unchanged rows
    route DUPLICATE and drop; a re-delivered UPDATE rewrites the same
    buckets to the same state).

    The mart lives in the bucketed layout (``write_mart``): each batch
    rewrites ONLY the (bucket) partitions its arriving keys hash to —
    at 100 TB a micro-batch touches a handful of buckets, never the
    whole mart. The merge plan reads the same path it overwrites, so the
    pruned output is materialized (persist + count) before the write.
    ``prepare`` optionally pre-collapses each raw micro-batch to
    merge-ready arrivals (e.g. latest-per-key within the batch — the
    reference's E1 dedup before CDC). Batch sizes are bounded by
    maxFilesPerTrigger / Kafka admission control."""
    from pyspark_etl_project_spark.operators.scd2 import (
        read_mart, scd2_merge, write_mart)

    spark = stream.sparkSession
    # A fresh load clears BOTH the mart directory and the stream
    # checkpoint before seeding. The seed write alone is NOT a reset —
    # write_mart's bucketed dynamic overwrite touches only the buckets
    # the initial mart's keys hash to, so a previous run's other
    # buckets would silently survive under the new seed; and a
    # surviving checkpoint's committed offsets would make the restarted
    # stream SKIP batches whose merges the reset just erased (permanent
    # silent loss). With both cleared, the stream replays everything
    # and converges to the same mart (the merge is deterministic given
    # the seed).
    #
    # Destroying a caller-supplied path is OPT-IN, never a default:
    # ``reset=True`` wipes + seeds, ``reset=False`` resumes an
    # interrupted stream (keeps checkpoint AND mart, skips the
    # seeding), and the default ``None`` seeds only a virgin path —
    # when prior state exists it raises instead of guessing, so a path
    # mistake cannot silently erase someone's mart. (Hadoop FS API —
    # works on any supported filesystem, not just local.)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    targets = {}
    for p in (mart_path, mart_path + "_chk"):
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        targets[p] = (jpath, jpath.getFileSystem(hconf))
    existing = [p for p, (jp, fs) in targets.items() if fs.exists(jp)]
    if reset is None and existing:
        raise ValueError(
            f"foreach_batch_scd2: prior state exists at {existing}; pass "
            "reset=True to wipe it (fresh load, replays the whole "
            "stream) or reset=False to resume from the checkpoint")
    if reset is False:
        if mart_path not in existing:
            raise ValueError(
                "foreach_batch_scd2: reset=False (resume) requires an "
                f"existing mart at {mart_path}")
    else:
        for p in existing:
            jp, fs = targets[p]
            fs.delete(jp, True)
        write_mart(initial_mart, mart_path, partition_col=partition_col,
                   key=key, num_buckets=num_buckets)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        arrivals = prepare(batch) if prepare is not None else batch
        mart = read_mart(spark, mart_path)
        pinned: list = []
        merged = scd2_merge(mart, arrivals, run_ts=run_ts, key=key,
                            surrogate_col=surrogate_col, dense_ids=True,
                            pinned=pinned)
        write_mart(merged, mart_path, partition_col=partition_col,
                   key=key, num_buckets=num_buckets,
                   touched_keys=arrivals.select(key).distinct(),
                   materialize_first=True)
        # The write materialized the merge; release this batch's pins
        # (cached arrivals + the dense-id range exchange) or a
        # long-running stream accumulates one cached plan per batch.
        for df_ in pinned:
            df_.unpersist()

    q = (stream.writeStream.outputMode("append")
         .foreachBatch(merge_batch)
         .option("checkpointLocation", mart_path + "_chk")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_documents(spark: SparkSession, sf_dir: str,
                     min_doc_id: int = 300,
                     files: int = 2) -> tuple[DataFrame, str]:
    """File-source stream over a slice of the documents table, split
    into ``files`` parquet files so the stream genuinely delivers
    multiple micro-batches under maxFilesPerTrigger=1 (a single-file
    stream would collapse every incremental operator into one batch).
    Returns (stream, watch_dir). The split is on doc_id ranges, but
    downstream operators must stay batch-split-invariant — the file
    source orders by file discovery, which is not contractual."""
    import os
    import tempfile

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") >= min_doc_id)
            .select("doc_id", "text"))
    watch_dir = tempfile.mkdtemp(prefix="docs_stream_")
    lo = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    # Empty filtered slice → min/max are NULL; write `files` empty
    # chunks (so maxFilesPerTrigger still sees the expected file count
    # and downstream drains produce an empty stream) instead of
    # raising TypeError on None + int in the range filters below.
    span = (lo[1] - lo[0] + files) // files if lo[0] is not None else 1
    base = lo[0] if lo[0] is not None else 0
    for i in range(files):
        part = docs.filter(
            (F.col("doc_id") >= base + i * span)
            & (F.col("doc_id") < base + (i + 1) * span))
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(watch_dir, f"chunk{i}"))
    schema = T.StructType([T.StructField("doc_id", T.LongType(), True),
                           T.StructField("text", T.StringType(), True)])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(watch_dir, "chunk*")))
    return stream, watch_dir


def foreach_batch_band_index(stream: DataFrame, bands_path: str,
                             num_hashes: int = 8, num_bands: int = 4,
                             shingle_n: int = 3) -> None:
    """Continuous near-dup index maintenance: every micro-batch's docs
    are banded (shingle → minhash → LSH buckets) and APPENDED to the
    persistent (doc_id, band_id, band_hash) index — the always-on
    ingestion half of the daily-increment dedup
    (extensions/dedup.py:incremental_minhash_dedup). Verdicts are
    computed from the accumulated index AFTER the drain so the result
    is invariant to how the source splits batches (the file source's
    batch order is not contractual); the per-batch work stays a pure
    map + explode + append, no state store needed."""
    from pyspark_etl_project_spark.extensions.dedup import (
        _rows_per_band, lsh_bands, minhash_signature, word_shingles)

    # Same divisibility guard as every batch-side banding site: a plain
    # floor division here would silently drop trailing MinHash positions
    # and desync this stream-built index from the batch-built index it
    # must join against.
    rows_per_band = _rows_per_band(num_hashes, num_bands)

    def handle(batch: DataFrame, _epoch: int) -> None:
        banded = (batch
                  .select("doc_id",
                          word_shingles("text", shingle_n).alias("_sh"))
                  .filter(F.size("_sh") > 0)
                  .select("doc_id",
                          minhash_signature(F.col("_sh"), num_hashes)
                          .alias("_sig"))
                  .select("doc_id", F.explode(
                      lsh_bands(F.col("_sig"), num_bands, rows_per_band))
                      .alias("b"))
                  .select("doc_id", F.col("b.band_id").alias("band_id"),
                          F.col("b.band_hash").alias("band_hash")))
        banded.write.mode("append").parquet(bands_path)

    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def foreach_batch_kmv(stream: DataFrame, store_path: str,
                      k: int = 64, salt: str = "kmv-v1") -> None:
    """Streaming cardinality-sketch maintenance: per micro-batch the
    documents' distinct trigram hashes are reduced to the batch's k
    SMALLEST 48-bit md5 values and appended to the sketch store — so
    state grows by at most k rows per batch regardless of batch size,
    and because min-k is associative and commutative the final global
    k-th minimum is EXACTLY the batch-mode KMV over the union of all
    batches, no matter how the source split them. The estimator stays
    the integer (k-1)*2^48 div h_k of the batch operator
    (extensions/text.py:kmv_distinct_sketch)."""

    def handle(batch: DataFrame, _epoch: int) -> None:
        from pyspark_etl_project_spark.extensions.text import word_ngrams
        from pyspark_etl_project_spark.operators.stats import (
            kmv_value_hash)

        hashed = (batch
                  .select(F.explode(word_ngrams(F.col("text"), 3))
                          .alias("v"))
                  .distinct()
                  .select(kmv_value_hash(F.col("v"), salt).alias("h")))
        # k smallest DISTINCT hashes via distinct+orderBy+limit →
        # TakeOrderedAndProject (per-partition k-heaps, then a
        # k-bounded driver merge) — the batch's distinct-hash set is
        # corpus-sized, so a row_number over an UNPARTITIONED window
        # here would funnel every hash through one task just to keep k
        # of them. The distinct matters for the merge contract: a
        # 48-bit value collision inside the cut would otherwise let a
        # duplicate h crowd out the batch's k-th distinct minimum,
        # which no downstream dedup can recover (stats.py invariant:
        # every KMV arm dedupes on the hash).
        topk = hashed.distinct().orderBy("h").limit(k)
        topk.write.mode("append").parquet(store_path)

    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
