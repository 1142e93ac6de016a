"""Unit tests for normalization/hashing column functions (SURVEY.md §2.H/§2.I),
including the reference's fidelity quirks."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.hashing import row_fingerprint, source_system_identifier
from pyspark_etl_project_spark.functions.normalize import (
    duration_to_seconds,
    rating_ten_to_five,
    rating_words_to_score,
    true_false_to_flag,
    validity_flag,
    yes_no_to_flag,
)


def _one(spark, expr, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df.select(expr.alias("out")).first()["out"]


def test_rating_words(spark):
    for word, score in [("WORST", 1), ("BAD", 2), ("NEUTRAL", 3),
                        ("GOOD", 4), ("BEST", 5), ("best", 5)]:
        assert _one(spark, rating_words_to_score("r"), r=word) == score
    assert _one(spark, rating_words_to_score("r"), r="???") is None
    assert _one(spark, rating_words_to_score("r"), r=None) is None


def test_rating_ten_to_five_keeps_floor_quirk(spark):
    # floor(1/2)=0: rating 1 maps to 0 in the reference (JSON:209) — kept.
    got = {n: _one(spark, rating_ten_to_five("r"), r=str(n)) for n in range(1, 11)}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3, 8: 4, 9: 4, 10: 5}


def test_boolean_flags(spark):
    assert _one(spark, yes_no_to_flag("b"), b="yes") == 1
    assert _one(spark, yes_no_to_flag("b"), b="NO") == 0
    assert _one(spark, yes_no_to_flag("b"), b="maybe") is None
    assert _one(spark, true_false_to_flag("b"), b="True") == 1
    assert _one(spark, true_false_to_flag("b"), b="FALSE") == 0
    assert _one(spark, true_false_to_flag("b"), b=None) is None


def test_duration_to_seconds(spark):
    assert _one(spark, duration_to_seconds("d"), d="0:05:30") == 330
    assert _one(spark, duration_to_seconds("d"), d="2:00:01") == 7201
    assert _one(spark, duration_to_seconds("d"), d="garbage") is None
    assert _one(spark, duration_to_seconds("d"), d=None) is None


def test_validity_flag(spark):
    df = spark.createDataFrame([("a", "b"), (None, "b"), ("a", None)],
                               "x string, y string")
    out = [r["v"] for r in df.select(validity_flag(["x", "y"]).alias("v")).collect()]
    assert out == [1, 0, 0]


def test_row_fingerprint_stability_and_sensitivity(spark):
    df = spark.createDataFrame([(1, "a", None), (1, "a", None), (1, "b", None)],
                               "i int, s string, n string")
    hashes = [r["h"] for r in
              df.select(row_fingerprint(["i", "s", "n"]).alias("h")).collect()]
    assert hashes[0] == hashes[1]          # equal rows ⇒ equal hash
    assert hashes[0] != hashes[2]          # differing column ⇒ different hash
    assert len(hashes[0]) == 32            # md5 hex


def test_row_fingerprint_null_vs_literal_NULL_collide_as_in_reference(spark):
    # The reference coalesces nulls to the string 'NULL' (CSV:80-83), so a
    # literal 'NULL' value collides by design — document, don't "fix".
    df = spark.createDataFrame([("NULL",), (None,)], "s string")
    hashes = [r["h"] for r in df.select(row_fingerprint(["s"]).alias("h")).collect()]
    assert hashes[0] == hashes[1]


def test_source_system_identifier(spark):
    df = spark.createDataFrame([(42,)], "id int")
    out = df.select(source_system_identifier("AT&T", "id").alias("ssi")).first()["ssi"]
    assert out == "AT&T - 42"


def test_registry_rotation_is_code_change_aware(tmp_path, monkeypatch):
    """A query whose implementation changed since its recorded green
    fingerprint must sort with the never-green block (the gate re-runs
    it next round), while unchanged green queries keep oldest-green
    order. Ledger built in-memory against the real registry so the
    test exercises the real fingerprint construction."""
    import json

    from pyspark_etl_project_spark.plans import registry

    queries, oracle = registry._raw_maps()
    green = registry._latest_green_round()
    green_names = [n for n in queries if n in green]
    assert len(green_names) >= 2
    changed, fresh = green_names[0], green_names[1]
    ledger = {
        # Recorded hash differs from the current fingerprint → changed.
        changed: {"round": green[changed], "hash": "stale-fingerprint"},
        # Recorded hash matches → evidence still valid.
        fresh: {"round": green[fresh],
                "hash": registry.query_fingerprint(queries[fresh],
                                                   oracle.get(fresh))},
    }
    path = tmp_path / "GREEN_HASHES.json"
    path.write_text(json.dumps(ledger))
    monkeypatch.setattr(registry, "GREEN_HASHES_PATH", str(path))
    # The ordering is memoized per process (fixed inputs in
    # production); this test swaps the ledger, so drop the memo —
    # monkeypatch restores the real cache state afterwards.
    monkeypatch.setattr(registry, "_order_cache", None)

    names = list(registry.all_queries())
    # Every green query absent from the ledger is also treated as
    # changed, so the verified-unchanged query must sort after ALL
    # unverified ones — in particular after the hash-mismatched one.
    assert names.index(changed) < names.index(fresh)
    never_green = [n for n in queries if n not in green]
    for n in never_green:
        assert names.index(n) < names.index(fresh)


def test_domain_audit_null_counts_as_violation_unless_rule_allows(spark):
    """catalog.domain_audit's documented NULL contract: a NULL in the
    checked column makes the predicate NULL, and the row must count as
    a VIOLATION (NULL is outside every declared domain) — the
    when(pred, 0).otherwise(1) form, not when(~pred, 1) which would
    silently pass NULLs. A rule that wants to accept NULL must opt in
    with isNull() | pred, and then only the true out-of-domain row
    counts."""
    from pyspark.sql import functions as F

    from pyspark_etl_project_spark.catalog import domain_audit

    df = spark.createDataFrame([("click",), (None,), ("bogus",)],
                               "event_type string")
    strict = F.col("event_type").isin("click", "view")
    lenient = F.col("event_type").isNull() | strict
    out = {r["rule"]: r["n_violations"] for r in
           domain_audit(df, [("strict", strict),
                             ("lenient", lenient)]).collect()}
    assert out == {"strict": 2, "lenient": 1}


def test_documentation_coverage_is_broadcast_only_no_fact_scan(spark):
    """The governance query runs entirely on seeded metadata frames: a
    broadcast join, no parquet scan, no sort-merge — it must stay free
    to run against a catalog of any width."""
    from pyspark_etl_project_spark.catalog import documentation_coverage

    df = documentation_coverage(spark)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Scan parquet" not in plan
    rows = {r["table_name"]: (r["n_cols"], r["n_documented"])
            for r in df.collect()}
    # events: 6 registered columns, 3 dictionary entries.
    assert rows["events"] == (6, 3)
