"""Tests for the registry rotation's evidence primitives and the
round-start ledger refresh tool (tools/update_green_hashes.py).

The drain machinery — which queries the external gate re-verifies each
round — is driven entirely by three pieces: the green-round scan over
CORRECTNESS_r*.json, the per-query code fingerprint, and the ledger
refresh that records gate-time fingerprints. Each has contract details
(rows-only green, never-downgrade, invalidate-by-watched-file) that a
silent regression would turn into stale evidence presented as fresh.
None of these touch Spark; all run in milliseconds.
"""

from __future__ import annotations

import importlib.util
import json
import os

from pyspark_etl_project_spark.functions.hashing import row_fingerprint
from pyspark_etl_project_spark.plans import registry

_TOOL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "update_green_hashes.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("update_green_hashes",
                                                  _TOOL_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_gate_file(root, rnd: int, rows: dict) -> None:
    with open(os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
        json.dump(rows, f)


def test_latest_green_round_semantics(tmp_path, monkeypatch):
    """Green = hash_match True, OR rows-only pass (hash_match absent /
    None with rows_match True — the driver's weaker check for
    non-SQL-expressible ops). A recorded hash FAILURE is red and must
    not overwrite an earlier green (max-round over green rows only);
    malformed rows and files are skipped, not fatal."""
    monkeypatch.setattr(registry, "_REPO_ROOT", str(tmp_path))
    _write_gate_file(tmp_path, 1, {
        "a": {"rows_match": True, "hash_match": True},
        "b": {"rows_match": True},                      # rows-only green
        "c": {"rows_match": True, "hash_match": False},  # red
        "d": {"rows_match": True, "hash_match": True},
        "junk": "not-a-dict",                            # skipped
    })
    _write_gate_file(tmp_path, 2, {
        "a": {"rows_match": False, "hash_match": False},  # later FAIL
        "b": {"rows_match": True, "hash_match": None},    # rows-only again
        "d": {"rows_match": True, "hash_match": True},
    })
    (tmp_path / "CORRECTNESS_rBAD.json").write_text("{not json")

    green = registry._latest_green_round()
    assert green["a"] == 1      # r2 failure doesn't erase the r1 green
    assert green["b"] == 2      # rows-only counts as green both rounds
    assert "c" not in green     # hash failure alone is never green
    assert green["d"] == 2


def test_fingerprint_covers_watched_module_bytes(monkeypatch):
    """query_fingerprint must change when a watched engine module's
    file content changes (simulated through the content-hash cache —
    same mechanism, no file mutation), and when the oracle SQL
    changes. Uses a real registry query so the watched-file discovery
    path (function-local dotted imports) is the one under test."""
    queries, oracle = registry._raw_maps()
    name = next(n for n in queries
                if registry._watched_files(queries[n]))
    fn, sql = queries[name], oracle.get(name)
    watched = registry._watched_files(fn)

    fp0 = registry.query_fingerprint(fn, sql)
    assert fp0 == registry.query_fingerprint(fn, sql)  # deterministic

    monkeypatch.setitem(registry._file_hash_cache, watched[0],
                        "simulated-edit")
    assert registry.query_fingerprint(fn, sql) != fp0

    monkeypatch.delitem(registry._file_hash_cache, watched[0])
    assert registry.query_fingerprint(fn, sql) == fp0  # cache restored
    assert registry.query_fingerprint(fn, (sql or "") + " --edit") != fp0


def test_ledger_refresh_records_never_downgrades_and_invalidates(
        tmp_path, monkeypatch, capsys):
    """The round-start refresh tool: (1) records a fingerprint for a
    query whose green round is newer than its ledger entry, (2) leaves
    an entry with round >= green round byte-identical (the gate-time
    hash must survive same-session re-runs), (3) keeps entries for
    de-registered queries, (4) --invalidate PATTERN drops exactly the
    entries whose query watches a module file matching the substring."""
    queries, oracle = registry._raw_maps()
    green = registry._latest_green_round()
    watched_green = [n for n in queries if n in green
                     and registry._watched_files(queries[n])]
    assert len(watched_green) >= 2
    newer, frozen = watched_green[0], watched_green[1]
    target_file = os.path.basename(
        registry._watched_files(queries[newer])[0])

    ledger = {
        newer: {"round": green[newer] - 1, "hash": "old-evidence"},
        frozen: {"round": green[frozen], "hash": "gate-time-hash"},
        "ghost_query": {"round": 1, "hash": "deregistered"},
    }
    path = tmp_path / "GREEN_HASHES.json"
    path.write_text(json.dumps(ledger))
    monkeypatch.setattr(registry, "GREEN_HASHES_PATH", str(path))

    tool = _load_tool()
    monkeypatch.setattr("sys.argv", ["update_green_hashes.py"])
    tool.main()
    out = json.loads(path.read_text())
    assert out[newer]["round"] == green[newer]
    assert out[newer]["hash"] == registry.query_fingerprint(
        queries[newer], oracle.get(newer))
    assert out[frozen] == {"round": green[frozen],
                           "hash": "gate-time-hash"}   # never downgraded
    assert out["ghost_query"]["hash"] == "deregistered"  # left behind
    # Every green, registered query now has an entry.
    assert all(n in out for n in queries if n in green)

    monkeypatch.setattr("sys.argv", ["update_green_hashes.py",
                                     "--invalidate", target_file])
    tool.main()
    out = json.loads(path.read_text())
    assert newer not in out
    assert "ghost_query" in out  # no registered fn -> can't match a file
    for n in out:
        fn = queries.get(n)
        assert fn is None or not any(
            target_file in f for f in registry._watched_files(fn))
    capsys.readouterr()  # swallow the tool's summary lines


def test_watched_files_sees_local_imports_and_global_helpers():
    """Both discovery paths: a function-local dotted import of an
    engine module, and a module-level helper resolved through
    co_names, must each land that module's file in the watched set —
    an unwatched module's edits couldn't invalidate green evidence.
    row_fingerprint is imported at module level on purpose: a nested
    function captures a test-local import as a closure cell (co_freevars),
    which the discovery deliberately does not follow — the plan modules'
    helpers are all module-level names."""

    def via_local_import():
        import pyspark_etl_project_spark.functions.normalize as nz
        return nz

    def via_global_helper():
        return row_fingerprint(["x"])

    local = registry._watched_files(via_local_import)
    assert any(f.endswith(os.path.join("functions", "normalize.py"))
               for f in local)
    global_ = registry._watched_files(via_global_helper)
    assert any(f.endswith(os.path.join("functions", "hashing.py"))
               for f in global_)


def test_order_names_drain_contract(monkeypatch):
    """The gate-window composition contract that the whole evidence
    drain rests on (drain_status.py reports it; all_queries() feeds the
    driver in this order): (1) never-green and fingerprint-stale
    queries sort FIRST, (2) then ascending latest-green round, (3)
    registration (insertion) order breaks every tie, (4) a green query
    with NO ledger entry counts as never-green (evidence without a
    recorded gate-time fingerprint is not evidence), (5) the order
    cache is keyed on the NAME SET — same set is served from cache for
    the process's lifetime, a registration change recomputes."""
    queries = {n: (lambda n=n: n) for n in
               ["q_r12", "q_never", "q_stale", "q_r9", "q_r9_later",
                "q_noledger"]}
    oracle = {n: f"SELECT '{n}'" for n in queries}
    green = {"q_r12": 12, "q_stale": 10, "q_r9": 9, "q_r9_later": 9,
             "q_noledger": 11}
    ledger = {
        "q_r12": {"round": 12, "hash": "fp:q_r12"},
        "q_stale": {"round": 10, "hash": "fp-of-code-since-rewritten"},
        "q_r9": {"round": 9, "hash": "fp:q_r9"},
        "q_r9_later": {"round": 9, "hash": "fp:q_r9_later"},
        # q_noledger: green per the gate files but no ledger entry
    }
    monkeypatch.setattr(registry, "_latest_green_round", lambda: green)
    monkeypatch.setattr(registry, "_load_green_hashes", lambda: ledger)
    monkeypatch.setattr(registry, "query_fingerprint",
                        lambda fn, sql: f"fp:{fn()}")
    monkeypatch.setattr(registry, "_order_cache", None)

    order = registry._order_names(queries, oracle)
    # Priority -1 cohort in insertion order: q_never (no green),
    # q_stale (ledger hash mismatch), q_noledger (green, no entry) —
    # then r9 pair in insertion order, then r12.
    assert order == ["q_never", "q_stale", "q_noledger",
                     "q_r9", "q_r9_later", "q_r12"]

    # Same name set -> cached: the exact list object comes back (the
    # ordering inputs are immutable within a round by design).
    assert registry._order_names(queries, oracle) is order

    # A changed name set recomputes: the new query joins the
    # never-green cohort (ahead of everything with a green round),
    # after its insertion-order peers.
    queries2 = dict(queries)
    queries2["q_new"] = lambda: "q_new"
    order2 = registry._order_names(queries2, oracle)
    assert order2 is not order
    assert order2 == ["q_never", "q_stale", "q_noledger", "q_new",
                      "q_r9", "q_r9_later", "q_r12"]
