"""Per-query plan-shape pins for the r12/r13/r14 gate cohorts — the
queries whose drain rounds are still ahead (r16: r12 evidence, r17:
r13, r18: r14) and that had no dedicated shape pin in test_scale.py.
Complements tests/test_plan_invariants.py (global anti-pattern sweep):
these pin each query's EXACT materialized-shuffle count and its EXACT
parquet ReadSchema column sets, so a regression that adds a shuffle or
widens a scan (e.g. dragging the documents text blob into a query that
only needs metadata) fails the moment it lands, not at its next gate
round.

Pins were generated from a plan census on the round-15 HEAD (every
query also DuckDB-oracle hash-verified the same day, 209/209) and are
asserted at sf0.001 under the shared test session (shuffle_partitions=4
— node counts are partition-count-independent; the census ran under the
same conf). An Exchange-count DECREASE also fails deliberately: a plan
improvement should be accompanied by re-pinning, keeping the ledger
honest the same way BNLJ_EXACT does.

ReadSchema sets are compared as an order-insensitive multiset of
column-name sets (Counter of frozensets — NOT sorted frozensets, whose
subset-partial-order __lt__ makes sorting non-canonical; r15 ADVICE):
scan order within the formatted plan is stable, but nothing in the pin
should depend on it.
"""

from __future__ import annotations

from collections import Counter

from conftest import formatted_plan, plan_nodes, read_schema_columns

SF_TINY = "/root/testdata/sf0.001"


def _facts(df) -> tuple[int, list[frozenset[str]]]:
    plan = formatted_plan(df)
    return plan_nodes(plan).count("Exchange"), read_schema_columns(plan)


def _check(spark, pins) -> list[str]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    bad = []
    for name, (want_ex, want_schemas) in pins.items():
        try:
            got_ex, got_sets = _facts(qs[name](spark, SF_TINY))
        except Exception as e:
            bad.append(f"{name}: failed to plan: {type(e).__name__}: {e}")
            continue
        if got_ex != want_ex:
            bad.append(f"{name}: Exchange count {got_ex} != {want_ex}")
        # '' pins the EMPTY column set (a count-only `ReadSchema:
        # struct<>` scan) — ''.split(',') would yield {''}, which no
        # real scan produces, so map it explicitly (r16 ADVICE).
        want_sets = [frozenset(s.split(",")) if s else frozenset()
                     for s in want_schemas]
        if Counter(got_sets) != Counter(want_sets):
            bad.append(f"{name}: ReadSchema sets "
                       f"{sorted(sorted(s) for s in got_sets)} != "
                       f"{sorted(sorted(s) for s in want_sets)}")
    return bad


# r12-evidence cohort: (exact Exchange count, exact ReadSchema sets)
PINS_R12 = {
    "business_days_to_ship": (2, ['o_orderkey,o_orderdate,o_orderpriority', 'l_orderkey,l_shipdate']),
    "cogrouped_click_purchase": (2, ['ts,user_id,event_type', 'ts,user_id,event_type']),
    "customer_order_distribution": (2, ['c_custkey', 'o_orderkey,o_custkey,o_orderpriority']),
    "event_rate_anomalies": (2, ['ts,event_type']),
    "event_transition_matrix": (3, ['event_id,ts,user_id,event_type']),
    "grouped_mode_median_disc": (2, []),
    "hourweek_seasonality": (2, []),
    "impute_missing_values": (2, []),
    "ingestion_completeness_daily": (2, ['ts']),
    "json_props_quarantine": (1, ['event_id,props']),
    "label_propagation_communities": (0, []),
    "multimodal_audio_mixdown": (0, ['doc_id']),
    "multimodal_grayscale": (0, ['doc_id']),
    "order_priority_late_ship": (1, ['o_orderkey,o_orderdate,o_orderpriority', 'l_orderkey,l_shipdate']),
    "part_copurchase_topk": (3, []),
    "purchase_attribution_last_touch": (2, ['event_id,ts,user_id,event_type']),
    "revenue_share_of_parent": (1, []),
    "rollup_consistency_check": (3, ['ts,value', 'ts,value']),
    "self_similarity_decay": (8, ['text', 'text', 'text', 'text']),
    "source_reconciliation_report": (3, ['o_orderkey,o_totalprice', 'o_orderkey,o_totalprice']),
    "table_content_fingerprint": (1, ['l_orderkey,l_linenumber,l_quantity,l_returnflag']),
    "tfidf_doc_similarity_topk": (5, []),
    "time_weighted_average": (1, ['event_id,ts,user_id,value']),
    "token_prefix_index": (2, []),
    "triangle_count_doc_links": (1, []),
    "user_active_coverage": (1, ['ts,user_id']),
    "user_activity_streaks": (2, ['ts,user_id']),
    "value_dispersion_by_type": (1, ['event_type,value']),
    "winsorized_order_totals": (3, []),
}


def test_r12_cohort_plan_shapes(spark):
    bad = _check(spark, PINS_R12)
    assert not bad, "\n".join(bad)


# r13-evidence cohort: (exact Exchange count, exact ReadSchema sets)
PINS_R13 = {
    "asof_join_forward_error": (1, ['event_id,ts,user_id,event_type', 'event_id,ts,user_id,event_type']),
    "asof_join_view_purchase": (1, ['event_id,ts,user_id,event_type', 'event_id,ts,user_id,event_type']),
    "balanced_token_shards": (5, ['doc_id,text']),
    "case_when_normalize": (0, ['o_orderkey,o_orderstatus,o_totalprice,o_orderpriority']),
    "compaction_roundtrip": (1, ['source,n_chars']),
    "dedup_levenshtein_prefix": (2, ['doc_id,text', 'doc_id,text']),
    "deterministic_shuffle_order": (4, ['doc_id']),
    "distinct_projection": (1, ['o_orderstatus,o_orderpriority']),
    "embedding_ivf_index_probe": (0, ['vec_id,embedding']),
    "embedding_quantized_rerank_topk": (0, ['vec_id,embedding']),
    "embedding_quantized_topk": (0, ['vec_id,embedding']),
    "embedding_topk_batched": (1, ['vec_id,embedding', 'vec_id,embedding']),
    "etl_csv_pipeline_full": (10, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "etl_csv_two_load_incremental": (10, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "etl_json_pipeline_full": (10, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority', 'o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "etl_xml_pipeline_full": (10, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority', 'o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "group_minmax_normalize": (1, ['event_id,event_type,value']),
    "multimodal_feature_extract": (0, ['doc_id,text']),
    "pii_redaction_scan": (0, ['event_id,props']),
    "range_join_event_intervals": (0, ['event_id', 's_suppkey']),
    "retention_latest_per_group": (1, ['event_id,event_type']),
    "salted_join_supplier_agg": (1, ['l_suppkey,l_quantity', 's_suppkey,s_nationkey']),
    "salted_skew_agg": (2, ['l_quantity,l_extendedprice,l_returnflag']),
    "scd2_asof_snapshot": (10, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "scd2_vacuum_expired": (9, ['o_orderkey,o_orderstatus,o_orderdate,o_orderpriority']),
    "scd2_vacuum_roundtrip": (0, ['csd_id,ssi,c_mktsegment,active_flag,START_DATE,END_DATE']),
    "scd2_vacuum_type_widened": (0, ['csd_id,ssi,END_DATE']),
    "streaming_band_index_compacted": (5, ['doc_id,band_id,band_hash', 'doc_id,text', 'doc_id,band_id,band_hash', 'doc_id,band_id,band_hash']),
    "streaming_dedup_within_watermark": (0, []),
    "streaming_scd2_merge": (0, ['csd_id,ssi,event_id,event_type,ACTIVE_FLAG,START_DATE,END_DATE']),
    "streaming_session_window": (0, []),
    "streaming_stateful_user_totals": (1, []),
    "streaming_static_enrich_agg": (0, []),
    "streaming_stream_stream_join": (0, []),
    "streaming_window_agg": (0, []),
    "timestamp_parse_roundtrip": (0, ['event_id,ts']),
    "vocab_top_tokens": (1, ['text']),
    "zorder_layout_sample": (0, ['l_orderkey,l_partkey,l_linenumber']),
}


def test_r13_cohort_plan_shapes(spark):
    bad = _check(spark, PINS_R13)
    assert not bad, "\n".join(bad)


# r14-evidence cohort: (exact Exchange count, exact ReadSchema sets)
PINS_R14 = {
    "boilerplate_line_scrub": (5, ['doc_id,text', 'doc_id,text']),
    "catalog_doc_coverage": (1, []),
    "catalog_domain_audit": (1, ['user_id,event_type,value']),
    "curation_pipeline_full": (2, ['doc_id,text']),
    "decontamination_overlap": (3, ['doc_id,text', 'doc_id,text', 'doc_id,text']),
    "dedup_cluster_canonical": (0, []),
    "dedup_embedding_threshold": (0, ['vec_id,embedding', 'vec_id,embedding', 'vec_id,embedding', 'vec_id,embedding']),
    "dedup_minhash_lsh": (1, ['doc_id,text', 'doc_id,text', 'doc_id,text', 'doc_id,text']),
    "dedup_ngram_jaccard": (3, []),
    "dedup_simhash": (2, ['doc_id,text']),
    "distinctive_terms_topk": (4, ['doc_id,text', 'doc_id,text']),
    "embedding_ivf_topk": (0, ['vec_id,embedding']),
    "embedding_lsh_topk": (0, ['vec_id,embedding']),
    "incremental_dedup_new_batch": (2, ['doc_id,text', 'doc_id,text']),
    "kmeans_refine_cells": (1, ['vec_id,embedding']),
    "multimodal_image_decode": (0, ['doc_id']),
    "multimodal_resize": (0, ['doc_id,text']),
    "observed_load_audit": (0, []),
    "pandas_udf_surface": (2, []),
    "python_datasource_scan": (1, ['doc_id,lang,n_tokens,checksum']),
    "schema_evolution_read": (0, ['o_orderkey,o_custkey,o_price_cents']),
    "text_repetition_signals": (2, ['doc_id,text']),
}


def test_r14_cohort_plan_shapes(spark):
    bad = _check(spark, PINS_R14)
    assert not bad, "\n".join(bad)
