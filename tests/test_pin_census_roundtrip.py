"""Round-trip guard for tools/pin_census.py — the generator any
deliberate r18+ re-pin runs. If its output format or session config
ever drifts from what the pin suite asserts, a future re-pin would
paste wrong pins that LOOK authoritative. This pins the loop closed:
the tool's emitted line for a query must parse into exactly the tuple
the suite currently pins for that query.

Two cheap map-only queries keep the subprocess run to one short Spark
session; the full-registry agreement is already enforced by the pin
suite itself (which asserts every pin against a live plan).
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "pin_census.py")
_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_NAMES = ["scan_filter_project", "validity_flag"]


def test_pin_census_output_matches_suite_pins():
    r = subprocess.run(
        [sys.executable, _TOOL, _SF, *_NAMES],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    emitted = {}
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line.startswith('"'):
            continue
        # line shape: "name": (n, ['csv', ...]),
        parsed = ast.literal_eval("{" + line.rstrip(",") + "}")
        emitted.update(parsed)
    assert sorted(emitted) == sorted(_NAMES), r.stdout

    from test_cohort_pins import PINS_R12, PINS_R13, PINS_R14, PINS_REST
    suite_pins = {**PINS_R12, **PINS_R13, **PINS_R14, **PINS_REST}
    for name in _NAMES:
        assert emitted[name] == suite_pins[name], (
            f"pin_census output for {name} drifted from the suite pin: "
            f"tool={emitted[name]!r} suite={suite_pins[name]!r}")


def test_pin_census_reports_broken_query_loudly():
    r = subprocess.run(
        [sys.executable, _TOOL, _SF, "no_such_query_xyz"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 1
    assert "FAILED no_such_query_xyz" in r.stderr
