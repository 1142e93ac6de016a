"""Value-equivalence pins for optional-argument arms no registered
query exercises.

Round-16 origin: the dedup_lines_in_doc ``sep`` defect lived precisely
in a non-default argument value (every registered caller used the
default), so the oracle gate could never see it. This module sweeps
the same class: every branch-selecting optional argument whose
non-default arm is otherwise untested gets a pin asserting the arm
produces the same VALUES as the gate-verified default arm (broadcast
hints and materialization flags are physical-plan choices — flipping
them must never change results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import formatted_plan, plan_nodes


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_scd2_merge_broadcast_keys_false_matches_default(spark):
    """broadcast_keys only changes the key-split join strategy; the
    merged mart must be row-identical, and the non-broadcast arm must
    still plan equi-joins (no cartesian fallback)."""
    from pyspark_etl_project_spark.operators.scd2 import scd2_merge

    mart = spark.createDataFrame(
        [(1, "A", "v1", 1, "2020-01-01 00:00:00", "2099-12-31 00:00:00"),
         (2, "B", "v1", 1, "2020-01-01 00:00:00", "2099-12-31 00:00:00"),
         (3, "C", "v0", 0, "2019-01-01 00:00:00", "2020-01-01 00:00:00")],
        "CSD_ID long, SOURCE_SYSTEM_IDENTIFIER string, val string, "
        "ACTIVE_FLAG int, START_DATE string, END_DATE string") \
        .withColumn("START_DATE", F.col("START_DATE").cast("timestamp")) \
        .withColumn("END_DATE", F.col("END_DATE").cast("timestamp"))
    arrivals = spark.createDataFrame(
        [("A", "v2"), ("D", "v1")],
        "SOURCE_SYSTEM_IDENTIFIER string, val string")

    cols = ["SOURCE_SYSTEM_IDENTIFIER", "val", "ACTIVE_FLAG", "CSD_ID"]
    got_default = _rows(scd2_merge(mart, arrivals, dense_ids=True,
                                   run_ts="2024-01-01 00:00:00"), cols)
    flipped = scd2_merge(mart, arrivals, dense_ids=True,
                         run_ts="2024-01-01 00:00:00",
                         broadcast_keys=False)
    assert _rows(flipped, cols) == got_default
    nodes = plan_nodes(formatted_plan(flipped))
    assert nodes.count("CartesianProduct") == 0


def test_incremental_join_view_broadcast_dim_false_matches_default(spark):
    from pyspark_etl_project_spark.operators.incremental import (
        incremental_join_view)

    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, dval string")
    fact0 = spark.createDataFrame([(1, 10)], "k int, amt int")
    view = fact0.join(dim, "k").select("k", "amt", "dval")
    delta = spark.createDataFrame([(2, 20), (1, 30)], "k int, amt int")

    cols = ["k", "amt", "dval"]
    want = _rows(incremental_join_view(view, delta, dim, "k"), cols)
    got = incremental_join_view(view, delta, dim, "k", broadcast_dim=False)
    assert _rows(got, cols) == want
    assert plan_nodes(formatted_plan(got)).count("CartesianProduct") == 0


def test_winnowing_contamination_broadcast_holdout_false_matches(spark):
    from pyspark_etl_project_spark.extensions.dedup import (
        winnowing_contamination)

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally unrelated words nothing shared here at all"),
         (3, "prefix junk alpha beta gamma delta epsilon zeta suffix")],
        "doc_id long, text string")
    holdout = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")

    cols = ["doc_id", "n_shared_fps", "n_holdout_docs"]
    want = _rows(winnowing_contamination(train, holdout, "doc_id", "text"),
                 cols)
    got = winnowing_contamination(train, holdout, "doc_id", "text",
                                  broadcast_holdout=False)
    assert _rows(got, cols) == want
    # The winnowing containment guarantee must hold in both arms: both
    # docs embedding the shared >= k+window-1 token passage collide.
    assert {r[0] for r in want} == {1, 3}


def test_rare_token_scores_materialize_false_matches(spark):
    from pyspark_etl_project_spark.extensions.text import rare_token_scores

    df = spark.createDataFrame(
        [(1, "the the the common words here"),
         (2, "zyx qwv unusual rare rare tokens"),
         (3, "the common words again and again")],
        "doc_id long, text string")
    cols = ["doc_id", "n_tokens", "n_rare", "rare_ppm", "mean_freq_x1000"]
    want = _rows(rare_token_scores(df, "doc_id", "text"), cols)
    got = rare_token_scores(df, "doc_id", "text", materialize=False)
    assert _rows(got, cols) == want


def test_bloom_pruned_join_left_semi_equals_exact_semi(spark):
    """The bloom filter is a PREFILTER (may pass false positives, never
    drops true matches); composed with the exact join, how='left_semi'
    must equal a plain left_semi join."""
    from pyspark_etl_project_spark.operators.joins import bloom_pruned_join

    big = spark.createDataFrame([(i, i * 10) for i in range(200)],
                                "k int, v int")
    small = spark.createDataFrame([(k,) for k in (3, 50, 199, 300)],
                                  "k int")
    cols = ["k", "v"]
    want = _rows(big.join(small, "k", "left_semi"), cols)
    got = bloom_pruned_join(big, small, "k", how="left_semi")
    assert _rows(got, cols) == want


def test_parse_xml_records_keep_cols_projects_exactly(spark):
    from pyspark_etl_project_spark.sources.xml_source import (
        XML_RECORD_FIELDS, parse_xml_records)

    xml = ("<RECORD>" + "".join(f"<{f}>1</{f}>" for f in XML_RECORD_FIELDS)
           + "</RECORD>")
    df = spark.createDataFrame([("a", "b", xml)],
                               "extra1 string, extra2 string, "
                               "STREAMING_DATA string")
    # Default: every non-payload passthrough column survives.
    assert parse_xml_records(df).columns[:2] == ["extra1", "extra2"]
    # keep_cols: exactly the requested passthroughs, in order.
    got = parse_xml_records(df, keep_cols=["extra2"])
    assert got.columns == ["extra2", *XML_RECORD_FIELDS]
    assert got.collect()[0]["extra2"] == "b"


def test_quality_score_explicit_default_stopwords_match(spark):
    """Passing the default stopword list explicitly must be a no-op,
    and a stopword list the text misses must lower the score."""
    from pyspark_etl_project_spark.extensions.text import (
        LANG_MARKERS, quality_score)

    body = " ".join(["the quick brown fox jumps over the lazy dog and"] * 4)
    df = spark.createDataFrame([(body,)], "text string")
    default = df.select(quality_score("text").alias("q")).collect()[0]["q"]
    explicit = df.select(
        quality_score("text", stopwords=LANG_MARKERS["en"])
        .alias("q")).collect()[0]["q"]
    assert default == explicit
    missed = df.select(
        quality_score("text", stopwords=["zzz", "qqq"])
        .alias("q")).collect()[0]["q"]
    assert missed < default


def test_salted_agg_result_invariant_to_num_salts(spark):
    """The salt is physical-plan routing only: any num_salts must
    produce identical merged aggregates (the content-derived salt
    guards retry determinism, not values)."""
    from pyspark_etl_project_spark.operators.joins import salted_agg

    rows = [("hot", i % 7, i) for i in range(500)] + \
           [("cold", 1, 99), ("cold", 2, 1)]
    df = spark.createDataFrame(rows, "k string, a int, b int")
    aggs = [("a", "sum", "sum_a"), ("b", "max", "max_b"),
            ("a", "count", "n"), ("b", "min", "min_b")]
    cols = ["k", "sum_a", "max_b", "n", "min_b"]
    want = _rows(salted_agg(df, "k", aggs), cols)
    for num_salts in (1, 3, 64):
        got = _rows(salted_agg(df, "k", aggs, num_salts=num_salts), cols)
        assert got == want, num_salts


def test_deterministic_shuffle_optional_arms(spark):
    """num_partitions must not change the permutation (the order is
    defined by the md5 key, not the layout), and key_col must expose
    exactly the shuffle key the default arm sorted by."""
    from pyspark_etl_project_spark.extensions.layout import (
        deterministic_shuffle, shuffle_key)

    df = spark.createDataFrame([(i,) for i in range(97)], "id int")
    base = {r["id"]: r["pos"]
            for r in deterministic_shuffle(df, "id", seed=7).collect()}
    repart = {r["id"]: r["pos"]
              for r in deterministic_shuffle(df, "id", seed=7,
                                             num_partitions=3).collect()}
    assert repart == base
    keyed = deterministic_shuffle(df, "id", seed=7, key_col="mykey")
    rows = keyed.collect()
    assert {r["id"]: r["pos"] for r in rows} == base
    want_keys = {r["id"]: r["k"]
                 for r in df.select("id",
                                    shuffle_key("id", 7).alias("k"))
                 .collect()}
    assert {r["id"]: r["mykey"] for r in rows} == want_keys


def test_connected_clusters_deep_chain_converges_in_default_budget(spark):
    """A 300-link path graph is the worst case plain propagation cannot
    finish in 20 rounds (it moves labels one hop per round); the
    pointer-doubling claim in connected_dedup_clusters' docstring is
    exactly that such chains converge in O(log diameter). Pin it: every
    node must reach cluster_id 0 within the DEFAULT max_iters."""
    from pyspark_etl_project_spark.extensions.dedup import (
        connected_dedup_clusters)

    n = 300
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    out = connected_dedup_clusters(pairs, ids).collect()
    assert len(out) == n
    assert {r["cluster_id"] for r in out} == {0}
