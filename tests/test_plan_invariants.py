"""Registry-WIDE physical-plan invariants — every registered query,
present and future, gets its plan swept for the three anti-patterns
that kill a 100 TB run, in one test:

1. CartesianProduct: NEVER, no exceptions. An O(n*m) join at cluster
   scale is a non-starter; every census to date (r15: 209/209 plans)
   shows zero, and this pin makes a regression impossible to land
   silently.
2. BatchEvalPython: NEVER. Row-at-a-time Python UDFs serialize one row
   per round-trip; the engine's convention is Arrow-batched stages
   only (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas all
   render as their own node names and stay allowed).
3. BroadcastNestedLoopJoin: exact per-query allowlist. The engine's
   scalar-attach convention (crossJoin(F.broadcast(<1-row aggregate>))
   — O(n) against exactly one build row) plans as a BNLJ, so a blanket
   ban is wrong; instead every query's BNLJ count is pinned exactly.
   A count INCREASE means a new nested loop crept into that plan; a
   query not listed here must plan zero.

This complements the per-query shape pins in test_scale.py (exact
Exchange counts, ReadSchema sets, PushedFilters): those are deep pins
on chosen plans; this is a shallow pin on EVERY plan, so a freshly
registered query is born covered. Census source: /tmp-census r15,
tools/plan_audit.py history, and the per-cohort pins adjudicated
r10-r14 (tests/test_scale.py:1028,1074 et al.).

Runs at sf0.001: plan compilation dominates; queries whose builders
execute side work (streaming micro-batches, roundtrip sinks) keep that
work tiny at this SF. Budget ~3 min for the full registry.
"""

from __future__ import annotations

SF_TINY = "/root/testdata/sf0.001"

# The scalar-attach allowlist: query -> exact BroadcastNestedLoopJoin
# count. Every entry was adjudicated as the 1-row-broadcast convention
# (multi-count rows attach several independent global aggregates, e.g.
# partial_stats_merge attaches per-statistic totals; join_skew_report
# attaches the global skew summary to each report branch).
BNLJ_EXACT = {
    "rare_token_quality_score": 1,
    "mad_length_outliers": 1,
    "curriculum_length_buckets": 1,
    "collocations_topk": 1,
    "hard_negative_mining": 1,
    "retrieval_mrr_by_label": 1,
    "bigram_surprise_score": 1,
    "minhash_vs_jaccard_eval": 2,
    "streaming_kmv_trigram_sketch": 1,
    "length_drift_deciles": 2,
    "dictionary_encode_roundtrip": 1,
    "largest_remainder_allocation": 1,
    "partial_stats_merge": 6,
    "session_basket_lift": 1,
    "event_debounce_collapse": 2,
    "abc_part_classification": 1,
    "latest_version_per_key": 1,
    "dim_prep_lookup": 1,
    "bloom_pruned_lineitem_join": 1,
    "streaming_kmv_store_compacted": 1,
    "join_skew_report": 5,
    "conversion_latency_deciles": 1,
    "temperature_mixture_sample": 1,
}


# Shared plan primitives live in conftest (r15 ADVICE: one copy).
from conftest import formatted_plan as _formatted_plan  # noqa: E402
from conftest import plan_nodes as _nodes  # noqa: E402


def test_every_registered_query_plan_is_free_of_scale_antipatterns(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    violations: list[str] = []
    for name, fn in qs.items():
        try:
            nodes = _nodes(_formatted_plan(fn(spark, SF_TINY)))
        except Exception as e:  # a query that won't even plan is worse
            violations.append(f"{name}: failed to plan: "
                              f"{type(e).__name__}: {e}")
            continue
        if nodes.count("CartesianProduct"):
            violations.append(f"{name}: CartesianProduct in plan")
        if nodes.count("BatchEvalPython"):
            violations.append(f"{name}: row-at-a-time BatchEvalPython "
                              f"(Arrow-only convention)")
        want = BNLJ_EXACT.get(name, 0)
        got = nodes.count("BroadcastNestedLoopJoin")
        if got != want:
            violations.append(
                f"{name}: BroadcastNestedLoopJoin count {got} != {want} "
                f"(scalar-attach allowlist)")
    assert not violations, "\n".join(violations)
    # The allowlist must not hold dead entries (a de-registered or
    # rewritten query should drop out, keeping the list honest).
    stale = set(BNLJ_EXACT) - set(qs)
    assert not stale, f"BNLJ_EXACT entries for unregistered queries: {stale}"


# At 100 TB, size estimates exceed any broadcast threshold, so a plan
# whose shape depends on AUTO-broadcast is lying about scale. This
# sweep re-plans the registry with size-based broadcasting OFF: every
# explicit F.broadcast survives (the scalar-attach BNLJs keep their
# exact counts), and nothing new degrades to a cartesian.
#
# These exception lists exist to make any future violation LOUD: a
# query may only appear here with a written adjudication (see the
# round-15 event_debounce_collapse precedent, fixed in round 16), and
# the standing goal is that both stay empty.
CARTESIAN_NOBCAST_EXCEPTIONS: dict[str, int] = {}
BNLJ_NOBCAST_ADJUST: dict[str, int] = {}


def test_registry_plans_survive_disabled_auto_broadcast(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    violations: list[str] = []
    try:
        for name, fn in qs.items():
            try:
                nodes = _nodes(_formatted_plan(fn(spark, SF_TINY)))
            except Exception as e:
                violations.append(f"{name}: failed to plan: "
                                  f"{type(e).__name__}: {e}")
                continue
            want_cart = CARTESIAN_NOBCAST_EXCEPTIONS.get(name, 0)
            if nodes.count("CartesianProduct") != want_cart:
                violations.append(
                    f"{name}: CartesianProduct count "
                    f"{nodes.count('CartesianProduct')} != {want_cart} "
                    f"with auto-broadcast disabled")
            want_bnlj = BNLJ_EXACT.get(name, 0) \
                + BNLJ_NOBCAST_ADJUST.get(name, 0)
            got = nodes.count("BroadcastNestedLoopJoin")
            if got != want_bnlj:
                violations.append(
                    f"{name}: BNLJ count {got} != {want_bnlj} with "
                    f"auto-broadcast disabled (an attach relying on "
                    f"size estimation?)")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert not violations, "\n".join(violations)
