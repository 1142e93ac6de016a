"""Reserved internal staging names fail loudly instead of silently
destroying caller columns (functions/reserved.py).

Before round 16 these collisions were silent: keep_latest would drop a
caller's ``_rn`` column, asof_join would EMIT a caller's ``_side``
column with engine-internal lit(1) values. Same latent class as the
dedup_lines_in_doc separator defect — reachable only through inputs no
internal caller produces, therefore invisible to the oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _raises_reserved(fn):
    with pytest.raises(ValueError, match="reserved internal"):
        fn()


def test_keep_latest_rejects_rn_collision(spark):
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 2, "x")], "k int, _rn int, v string")
    _raises_reserved(lambda: keep_latest(df, keys="k", order_by="v"))
    # The max_by arm never stages on the caller's frame — it must keep
    # accepting the same input (the struct round-trips user columns).
    out = keep_latest(df, keys="k", order_by="v", use_max_by=True).collect()
    assert out[0]["_rn"] == 2


def test_latest_version_per_key_rejects_rn_collision(spark):
    from pyspark_etl_project_spark.operators.watermark import (
        latest_version_per_key)

    df = spark.createDataFrame([(1, 5, 9)], "k int, ver int, _rn int")
    _raises_reserved(lambda: latest_version_per_key(df, "k", "ver"))


def test_asof_join_rejects_staging_collisions(spark):
    from pyspark_etl_project_spark.operators.joins import asof_join

    right = spark.createDataFrame([(1, 10, "p")],
                                  "k int, ts int, payload string")
    for bad in ("_ts", "_side", "_m", "_r_payload"):
        left = spark.createDataFrame([(1, 11, 7)],
                                     f"k int, ts int, `{bad}` int")
        _raises_reserved(lambda left=left: asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["payload"]))


def test_range_join_rejects_bucket_collision(spark):
    from pyspark_etl_project_spark.operators.joins import range_join

    pts = spark.createDataFrame([(5, 1)], "p int, _bucket int")
    iv = spark.createDataFrame([(0, 10)], "s int, e int")
    _raises_reserved(lambda: range_join(pts, iv, "p", "s", "e", 4))
    _raises_reserved(lambda: range_join(
        iv.selectExpr("s as p"), pts.selectExpr("p as s", "p+1 as e",
                                                "_bucket"),
        "p", "s", "e", 4))


def test_salted_join_rejects_salt_collision(spark):
    from pyspark_etl_project_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, 0)], "k int, _salt int")
    small = spark.createDataFrame([(1,)], "k int")
    _raises_reserved(lambda: salted_join(big, small, "k"))
    _raises_reserved(lambda: salted_join(small, big, "k"))


def test_dense_row_number_rejects_pid_collision(spark):
    from pyspark_etl_project_spark.operators.scd2 import dense_row_number

    df = spark.createDataFrame([(1, 2)], "k int, _dense_pid int")
    _raises_reserved(lambda: dense_row_number(df, ["k"], "pos"))


def test_deterministic_shuffle_rejects_key_collision(spark):
    from pyspark_etl_project_spark.extensions.layout import (
        deterministic_shuffle)

    df = spark.createDataFrame([(1, "x")], "id int, _shuffle_key string")
    _raises_reserved(lambda: deterministic_shuffle(df, "id", seed=1))


def test_guard_is_plan_build_time_and_noop_for_clean_frames(spark):
    """The guard must cost nothing at runtime (list check at plan build)
    and leave clean-frame behavior untouched."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                               "k int, o int, v string")
    out = keep_latest(df, keys="k", order_by="o").collect()
    assert [(r["k"], r["o"], r["v"]) for r in out] == [(1, 2, "b")]


# --- Round 17 (r16 ADVICE): case-insensitive matching + coverage ---

def test_guard_catches_case_variant_collisions(spark):
    """Under the default spark.sql.caseSensitive=false, withColumn
    REPLACES columns case-insensitively, so a caller's ``_RN`` is
    destroyed by staging ``_rn`` exactly like a lower-case one — the
    guard must compare the same way (r16 ADVICE, confirmed live:
    before the fix keep_latest silently emitted ['k','v'])."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 2, "x")], "k int, _RN int, v string")
    _raises_reserved(lambda: keep_latest(df, keys="k", order_by="v"))


def test_guard_exact_match_under_case_sensitive_resolution(spark):
    """With caseSensitive=true a case-variant name is a genuinely
    distinct column: the staged ``_rn`` is added and dropped separately
    and the caller's ``_RN`` passes through untouched — so the guard
    must NOT reject it (rejecting would break a working input)."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 2, "x")], "k int, _RN int, v string")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        out = keep_latest(df, keys="k", order_by="v").collect()
        assert [r["_RN"] for r in out] == [2]
    finally:
        spark.conf.set("spark.sql.caseSensitive", "false")


def test_lookup_join_rejects_lk_collision_both_sides(spark):
    """lookup_join passes ALL fact columns through and ends with a
    name-based drop("_lk") that removes EVERY column of that name — a
    fact-side ``_lk`` (any case) was silently destroyed before the r17
    guard; a dim-side one duplicates under the rename."""
    from pyspark_etl_project_spark.operators.lookup import lookup_join

    dim = spark.createDataFrame([(1, 100)], "dk int, id int")
    for bad_type in ("_lk string", "_LK string"):
        fact = spark.createDataFrame([(1, "keepme")], f"k int, {bad_type}")
        _raises_reserved(lambda fact=fact: lookup_join(
            fact, dim, "k", "dk", "id", "mapped_id"))
    fact_clean = spark.createDataFrame([(1,)], "k int")
    dim_bad = spark.createDataFrame([(1, 100, "x")],
                                    "dk int, id int, _lk string")
    _raises_reserved(lambda: lookup_join(
        fact_clean, dim_bad, "k", "dk", "id", "mapped_id"))


def test_prepare_dimension_rejects_rn_collision(spark):
    from pyspark_etl_project_spark.operators.lookup import prepare_dimension

    dim = spark.createDataFrame(
        [("a", 1, 1, "2024-01-01", 9)],
        "key string, id int, ACTIVE_FLAG int, START_DATE string, _rn int")
    _raises_reserved(lambda: prepare_dimension(dim, "key", "id"))


def test_parse_xml_records_rejects_rec_collision(spark):
    """Non-xml caller columns pass through parse_xml_records, so a
    caller ``_rec`` would be replaced by the parse struct and emitted
    under the caller's name."""
    from pyspark_etl_project_spark.sources.xml_source import (
        parse_xml_records, parse_xml_records_quarantined)

    df = spark.createDataFrame([("<RECORD></RECORD>", 7)],
                               "STREAMING_DATA string, _rec int")
    _raises_reserved(lambda: parse_xml_records(df))
    _raises_reserved(lambda: parse_xml_records_quarantined(df))


# --- Projection-benign staging sites: collision value-equivalence ---
# These operators stage underscore helpers on frames the engine
# PROJECTS first, so caller columns never reach the staging frame or
# the output — a colliding input is consumed, never corrupted. Pinned
# by running each op with and without colliding junk columns and
# asserting identical results (functions/reserved.py module docstring).

def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_survivorship_merge_ignores_colliding_caller_columns(spark):
    from pyspark_etl_project_spark.extensions.dedup import survivorship_merge

    base = spark.createDataFrame(
        [(1, "hello world", "a", 5), (2, "hello  WORLD", "b", 9),
         (3, "other text", "a", 1)],
        "doc_id int, text string, src string, q int")
    noisy = base.withColumn("_fp", F.lit("junk")) \
                .withColumn("_rn", F.lit(99))
    assert (_rows(survivorship_merge(noisy, "doc_id", "text", "src", "q"))
            == _rows(survivorship_merge(base, "doc_id", "text", "src", "q")))


def test_column_stats_partials_ignore_colliding_caller_columns(spark):
    from pyspark_etl_project_spark.operators.stats import (
        column_stats_partials)

    base = spark.createDataFrame([(1, 10), (1, 20), (2, 30)],
                                 "p int, v int")
    noisy = base.withColumn("_rn", F.lit(7))
    s0, h0 = column_stats_partials(base, F.col("p"), F.col("v"), k=4)
    s1, h1 = column_stats_partials(noisy, F.col("p"), F.col("v"), k=4)
    assert _rows(s1) == _rows(s0)
    assert _rows(h1) == _rows(h0)


def test_topk_for_queries_ignores_colliding_caller_columns(spark):
    from pyspark_etl_project_spark.extensions.similarity import (
        topk_for_queries)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id int, embedding array<double>")
    queries = spark.createDataFrame([(10, [1.0, 0.1])],
                                    "query_id int, query_vec array<double>")
    noisy_c = corpus.withColumn("_b", F.lit("junk")) \
                    .withColumn("_rn", F.lit(1)) \
                    .withColumn("_cv", F.lit(0))
    noisy_q = queries.withColumn("_b", F.lit("junk")) \
                     .withColumn("_qv", F.lit(0))
    for nb in (None, 2):
        assert (_rows(topk_for_queries(noisy_c, noisy_q, k=2, num_bits=nb))
                == _rows(topk_for_queries(corpus, queries, k=2,
                                          num_bits=nb)))


def test_remove_boilerplate_ignores_colliding_caller_columns(spark):
    from pyspark_etl_project_spark.extensions.text import (
        remove_boilerplate_lines)

    rows = [(i, "cookie banner unique text %d here" % i)
            for i in range(6)]
    base = spark.createDataFrame(rows, "doc_id int, text string")
    noisy = base.withColumn("_keep", F.lit(False)) \
                .withColumn("_boiler", F.lit(True)) \
                .withColumn("_line", F.lit("x"))
    assert (_rows(remove_boilerplate_lines(noisy, "doc_id", "text"))
            == _rows(remove_boilerplate_lines(base, "doc_id", "text")))


def test_guarded_inventory_matches_code():
    """functions/reserved.py's module docstring names the guaranteed-
    guarded entry points; this keeps that inventory honest code-side:
    every listed function must actually invoke the guard, so the doc
    cannot silently rot if a refactor drops a call."""
    import inspect

    from pyspark_etl_project_spark.extensions.layout import (
        deterministic_shuffle)
    from pyspark_etl_project_spark.operators.dedup import keep_latest
    from pyspark_etl_project_spark.operators.joins import (
        asof_join, range_join, salted_join)
    from pyspark_etl_project_spark.operators.lookup import (
        lookup_join, prepare_dimension)
    from pyspark_etl_project_spark.operators.scd2 import dense_row_number
    from pyspark_etl_project_spark.operators.watermark import (
        latest_version_per_key)
    from pyspark_etl_project_spark.sources.xml_source import (
        parse_xml_records, parse_xml_records_quarantined)

    inventory = [keep_latest, latest_version_per_key, asof_join,
                 range_join, salted_join, dense_row_number, lookup_join,
                 prepare_dimension, parse_xml_records,
                 parse_xml_records_quarantined, deterministic_shuffle]
    unguarded = [fn.__name__ for fn in inventory
                 if "require_free_columns" not in inspect.getsource(fn)]
    assert not unguarded, unguarded
