"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Emit format (round-7 policy): stdout is consumed by a TAIL-LIMITED
driver capture (~2000 chars), so the LAST stdout line is a COMPACT
summary JSON — {"metric", "value", "unit", "n_queries", "error_names",
"sf", "reps", "stat", "stream_startup_sec", "detail"} — guaranteed to
fit the capture window. The full per-query median map (plus per-query
errors) is written to the sidecar file named in "detail"
(BENCH_DETAIL.json next to this script) and committed, so cross-round
per-query comparisons cite the sidecar. BENCH_r06.json was truncated/
unparseable because the single line then carried all 105 entries.

Each query is materialized with the noop sink (full execution, no
driver-side collect) — measuring the distributed plan, not Arrow
transfer. Each query runs $SPARK_GRAFT_BENCH_REPS times (default 5)
and reports the per-query MEDIAN: single-shot times on a fixed-
overhead-dominated local harness made sub-second round-over-round
deltas unreadable (scheduling jitter of the same magnitude as the
numbers).

Round-10 policy: reps are INTERLEAVED (round-robin over the whole
query list, `reps` passes) rather than 5-consecutive-per-query, so a
transient machine-load spike smears a little over many queries'
distributions instead of landing entirely inside one query's 5
samples (r9 forensics: four code-untouched queries read >2x in one
run and ~1.2x in a same-code re-run). BENCH_DETAIL also records
per-query {median,min,max} ("stats") so drift is distinguishable from
regression at a glance: a real regression lifts MIN; noise lifts
max/spread while min stays put.

Reading deltas (round-6 policy, evidence in SCALE.md): even medians
move >2x when anything else runs on the box — a single-query delta
under ~3x is only actionable if it reproduces in an UNCONTENDED
re-run. Run comparisons on an otherwise idle machine.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_filter_project",
    "window_dedup_latest",
    "cdc_router",
    "join_dim_broadcast",
    "scd2_merge",
    "validity_flag",
    "latest_version_per_key",
    "dim_prep_lookup",
    "etl_csv_pipeline_full",
    "etl_json_pipeline_full",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_canonical",
    "deterministic_split_counts",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "text_stats",
    "streaming_window_agg",
    "asof_join_view_purchase",
    "range_join_event_intervals",
    "salted_skew_agg",
    "rollup_flag_status",
    "dedup_ngram_jaccard",
    "embedding_topk_batched",
    "text_repetition_signals",
    "pii_redaction_scan",
    "stratified_sample_deterministic",
    # round 3
    "dedup_levenshtein_prefix",
    "context_window_chunks",
    "pack_documents_bins",
    "multimodal_image_decode",
    "session_window_native",
    "source_quota_sample",
    "zorder_layout_sample",
    "moving_sum_time_range",
    "distinct_counts_per_group",
    "promo_revenue_split",
    # round 5
    "cohort_retention_weekly",
    "event_gap_detection",
    "deterministic_shuffle_order",
    "boilerplate_line_scrub",
    "temperature_mixture_sample",
    "curation_pipeline_full",
    # round 6
    "doc_fingerprint_winnowing",
    "bloom_pruned_lineitem_join",
    "manifest_pruned_scan",
    "intra_doc_line_dedup",
    "gopher_quality_gate",
    "embedding_gram_matrix",
    "winnowing_contamination",
    "doc_length_quantiles",
    "leakage_safe_split_counts",
    # embedding_pca_project was de-registered in round 9 (oracle-less
    # gate entry; the operator stays, covered by embedding_gram_matrix
    # + the numpy test).
    "multimodal_png_decode",
    "multimodal_wav_decode",
    "multimodal_video_decode",
    "rare_token_quality_score",
    "bpe_pair_counts",
    "next_token_conditional_topk",
    "domain_blocklist_filter",
    "bpe_train_merges",
    "bpe_encode_token_counts",
    "cross_source_overlap",
    "source_dataset_card",
    "mad_length_outliers",
    "keyword_topic_tags",
    "pagerank_doc_links",
    # round 6, second wave
    "dup_span_stats",
    "neardup_topk_neighbors",
    "ngram_novelty_per_source",
    "curriculum_length_buckets",
    "order_priority_late_ship",
    "customer_order_distribution",
    "weighted_quality_sample",
    "minhash_estimator_calibration",
    "kmv_distinct_sketch_trigrams",
    "collocations_topk",
    "containment_neardup_pairs",
    "event_transition_matrix",
    "tokenizer_fertility_by_lang",
    "streaming_band_index_dedup",
    "event_rate_anomalies",
    "table_column_stats",
    "incremental_join_view_orders",
    "cms_heavy_hitters_tokens",
    # scd2_asof_snapshot is oracle-gated but not benched: its cost is
    # ~entirely the two-load mart construction, already represented by
    # the etl pipeline entries (the snapshot itself is a pushed filter).
    "ann_recall_calibration",
    "hard_negative_mining",
    "source_reconciliation_report",
    "embedding_degeneracy_stats",
    "dup_span_scrub_text",
    "bigram_surprise_score",
    "join_skew_report",
    "dedup_survivorship_merge",
    "compaction_roundtrip",
    "minhash_vs_jaccard_eval",
    "tfidf_doc_similarity_topk",
    "length_drift_deciles",
    "conversion_latency_deciles",
    "session_basket_lift",
    "user_activity_streaks",
    "triangle_count_doc_links",
    "user_active_coverage",
    "winsorized_order_totals",
    "label_propagation_communities",
    # round 7 (registry growth frozen at +2 this round per r6 verdict)
    "hard_negative_mining_ann",
    "partial_stats_merge",
    # Round-12 set decision (SURVEY §7.1 candidate 4): the two r11
    # maintenance gates (scd2_vacuum_roundtrip,
    # streaming_kmv_store_compacted) are NOT added. Same rationale as
    # the scd2_asof_snapshot exclusion above: their bench time would be
    # ~entirely temp-mart/store construction, already represented by
    # the etl pipeline entries — and holding the set at 106 keeps
    # cross-round totals like-for-like, which matters more now that
    # noise_floor (below) exists to interpret those totals.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark_etl_project_spark.plans import all_queries
    from pyspark_etl_project_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the JVM + parquet footers once so per-query times measure the
    # plan, not first-touch overheads. Guarded: an empty headline∩registry
    # intersection (e.g. registry import failure) must still emit the
    # JSON payload below, never die on an IndexError here.
    if names:
        try:
            qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — warmup failure must not kill the run
            print(f"warmup failed: {exc}", file=sys.stderr)
    else:
        print("warning: no headline queries found in registry", file=sys.stderr)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    # One broken query must never zero the whole round's bench: isolate
    # per query, record null, keep going, and always print the JSON line.
    # Interleaved reps: pass p runs every query once, then the next
    # pass — machine drift averages ACROSS queries instead of
    # concentrating in whichever query owned the core during a spike.
    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    # Round-12 policy: one fixed-cost calibration probe per pass,
    # interleaved exactly like the queries. It runs NO repo code and
    # reads NO data (a 32-task spark.range sum), so its wall-clock is
    # pure harness overhead — scheduler latency, codegen, JVM ambient
    # load. Cross-round movement in noise_floor is machine drift BY
    # CONSTRUCTION; a totals delta is only attributable to code once
    # it exceeds what the noise_floor ratio predicts (r10→r11's +7%
    # sum_of_mins on untouched code was exactly this unresolvable
    # class — see SCALE.md "Bench interpretation").
    noise_samples: list[float] = []
    # One discarded warmup probe: pass-0 would otherwise absorb the
    # probe shape's one-time codegen, biasing the reported median
    # upward and muddying cross-round noise-floor ratio comparisons.
    try:
        _noise_floor_probe(spark)
    except Exception as exc:  # noqa: BLE001 — calibration must not kill the run
        print(f"noise-floor warmup failed: {exc}", file=sys.stderr)
    for _pass in range(reps):
        try:
            noise_samples.append(_noise_floor_probe(spark))
        except Exception as exc:  # noqa: BLE001 — calibration must not kill the run
            print(f"noise-floor probe failed: {exc}", file=sys.stderr)
        for name in names:
            if name in errors:
                continue
            try:
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[name].append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                errors[name] = str(exc).splitlines()[0][:200]
                print(f"query {name} failed: {errors[name]}", file=sys.stderr)
    times: dict[str, float | None] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in names:
        s = samples[name]
        if not s:
            times[name] = None
            continue
        # A failure on a LATER pass must not erase the earlier good
        # samples: record the stats over what succeeded, flag them
        # partial, and keep the error visible in error_names — so one
        # flaky pass costs sample count, not the whole query's record.
        times[name] = round(statistics.median(s), 3)
        stats[name] = {"median": times[name],
                       "min": round(min(s), 3),
                       "max": round(max(s), 3)}
        if name in errors:
            stats[name]["partial"] = True
            stats[name]["n_samples"] = len(s)

    # The streaming query's time conflates per-run fixed cost (query
    # start/stop, checkpoint + offset-log init, memory-sink setup) with
    # actual data throughput. Measure the fixed cost alone — the SAME
    # pipeline drained over an EMPTY source directory — and report it
    # separately, so cross-round movement in streaming_window_agg can be
    # attributed: steady-state data time ≈ total − stream_startup_sec.
    stream_startup: float | None = None
    if "streaming_window_agg" in names:
        try:
            stream_startup = _stream_startup_cost(spark, reps)
        except Exception as exc:  # noqa: BLE001
            errors["stream_startup"] = str(exc).splitlines()[0][:200]
            print(f"stream startup probe failed: {errors['stream_startup']}",
                  file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # BENCH_DETAIL.json is the COMMITTED official record SCALE.md cites
    # (sf0.1, median of 5, 32 cores). A run at another sf, rep count or
    # CORE COUNT must not clobber it — those write a suffixed sidecar
    # instead, and the summary line's "detail" field names whichever
    # file was written. The cpus suffix is the r17 PERF fix: the
    # driver's 8-core scaling re-run used to overwrite the 32-core
    # detail at the same path, leaving its per_query/scaling blocks
    # with nothing to read. SPARK_GRAFT_BENCH_DETAIL overrides the
    # path outright (absolute, or relative to this script's dir).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    official = sf_val == 0.1 and reps == 5 and cpus == "32"
    detail_name = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        "BENCH_DETAIL.json" if official
        else f"BENCH_DETAIL_sf{sf_val}_r{reps}_c{cpus}.json")
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    detail = {
        "queries": times,
        "stats": stats,
        "errors": errors,
        "sf": sf_val,
        "reps": reps,
        "cpus": cpus,
        "stat": "median",
        "rep_order": "interleaved",
    }
    if stream_startup is not None:
        detail["stream_startup_sec"] = stream_startup
    noise_floor: dict[str, float] | None = None
    if noise_samples:
        noise_floor = {
            "median": round(statistics.median(noise_samples), 3),
            "min": round(min(noise_samples), 3),
            "max": round(max(noise_samples), 3),
        }
        detail["noise_floor"] = noise_floor
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    # Compact summary as the FINAL stdout line: the driver captures only
    # the last ~2000 chars of stdout, so the per-query map must NOT ride
    # on this line (it lives in the sidecar above).
    payload = {
        "metric": "headline_queries_total_time",
        # value sums every query with at least one good sample — a
        # query with NO samples drops out, and n_ok < n_queries makes
        # the shrunken denominator visible, so a failed 60 s query
        # cannot masquerade as a 60 s speedup in a cross-round total.
        # A query that failed on a LATER pass still contributes (its
        # stats are over fewer, colder samples) — n_partial on this
        # line flags how many medians are that kind, so a total mixing
        # 1-sample times with 5-sample medians can't read as clean.
        "value": round(sum(t for t in times.values() if t is not None), 3),
        "unit": "sec",
        "n_queries": len(names),
        "n_ok": sum(1 for t in times.values() if t is not None),
        "n_partial": sum(1 for st in stats.values() if st.get("partial")),
        # Sum of per-query MINIMA — the statistic least moved by
        # machine drift (noise lifts max/spread; only a real
        # regression lifts min), so cross-round totals compare
        # like-for-like even when the box wasn't equally idle.
        "sum_of_mins": round(sum(st["min"] for st in stats.values()), 3),
        "sf": sf_val,
        "reps": reps,
        "cpus": cpus,
        "stat": "median",
        "detail": os.path.basename(detail_path),
    }
    if stream_startup is not None:
        payload["stream_startup_sec"] = stream_startup
    # Noise-floor calibration (min + median of the fixed probe): use it
    # to normalize cross-round totals — if round B's noise_floor is
    # 1.2x round A's, a 1.2x drift in sum_of_mins is ambient, not code.
    if noise_floor is not None:
        payload["noise_floor"] = {"median": noise_floor["median"],
                                  "min": noise_floor["min"]}
    if errors:
        payload["error_names"] = sorted(errors)
    print(json.dumps(payload))
    spark.stop()


def _noise_floor_probe(spark) -> float:
    """One fixed-cost calibration sample: a 32-task sum over
    spark.range — no repo code, no file IO, constant work per call.
    Wall-clock here is pure harness ambient (task scheduling, codegen,
    JVM/GC, machine load); any cross-round movement is noise by
    construction, giving the headline totals a same-run yardstick."""
    t0 = time.time()
    (spark.range(0, 2_000_000, 1, 32)
         .selectExpr("sum(id * 3 + 1) as s")
         .write.format("noop").mode("overwrite").save())
    return time.time() - t0


def _stream_startup_cost(spark, reps: int) -> float:
    """Median wall-clock of starting, draining (zero rows), and stopping
    the windowed-agg streaming pipeline over an empty directory — the
    per-run fixed cost embedded in every streaming_window_agg sample."""
    import tempfile

    from pyspark.sql import types as T

    from pyspark_etl_project_spark.streaming.ingest import (
        run_stream_to_memory, windowed_event_agg)

    schema = T.StructType([
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ])
    empty_dir = tempfile.mkdtemp(prefix="bench_stream_empty_")
    samples = []
    for _ in range(reps):
        t0 = time.time()
        stream = spark.readStream.schema(schema).parquet(empty_dir)
        agg = windowed_event_agg(stream, window_len="1 day", watermark="1 day")
        out = run_stream_to_memory(agg, output_mode="complete")
        out.write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


if __name__ == "__main__":
    main()
