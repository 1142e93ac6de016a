"""Pin bench.py's headline-set contract against the registry.

bench.py intersects HEADLINE with the live registry before timing
(`[n for n in HEADLINE if n in qs]` — deliberate, so a registry import
failure still emits a JSON payload instead of dying). The flip side:
a renamed or de-registered query would SILENTLY shrink the headline
set, and the bench total would "improve" by measuring less — exactly
the silent-cap class the repo's no-silent-caps rule exists for. The
driver's round-over-round comparison (BENCH_r{N}.json) assumes the
set is fixed; this test makes any drift loud instead.
"""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _headline():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_headline_set_is_exactly_registered_and_oracle_twinned():
    import __spark_entry__ as entrymod

    headline = _headline()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(headline) == len(set(headline)), "duplicate headline names"
    missing = [n for n in headline if n not in qs]
    assert not missing, f"headline names not in registry: {missing}"
    # Headline queries are also the perf contract's correctness
    # anchors: each must have a DuckDB oracle twin.
    untwinned = [n for n in headline if n not in oracles]
    assert not untwinned, f"headline names without oracle: {untwinned}"
    # The driver compares BENCH_r{N}.json round-over-round on a FIXED
    # 106-query set; resize deliberately (update this pin in the same
    # commit), never by drift.
    assert len(headline) == 106


def test_every_registered_query_has_an_oracle_twin():
    """209/209 oracle coverage is a load-bearing property: the driver
    downgrades twin-less queries to a rows-only check, and the judge
    sees which. The registry has held 100% twin coverage since r11;
    a new genuinely non-SQL-expressible op must relax this pin
    DELIBERATELY (same commit, with the rationale), never by omission."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    untwinned = sorted(set(qs) - set(oracles))
    assert not untwinned, f"queries without oracle twins: {untwinned}"
    orphaned = sorted(set(oracles) - set(qs))
    assert not orphaned, f"oracle entries without queries: {orphaned}"
