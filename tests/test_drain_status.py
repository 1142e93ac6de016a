"""Smoke pin for tools/drain_status.py — the round-start reporting
tool every round's checklist runs first. Its window-ordering and
fingerprint primitives are unit-tested in test_rotation_ledger.py;
this pins the tool end-to-end against the real repo state: it must
exit 0 and print all four report sections, and the registry line must
agree with the live registry size.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "drain_status.py")


def test_drain_status_smoke_sections_and_registry_count():
    r = subprocess.run([sys.executable, _TOOL, "5"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "effective-round histogram" in r.stdout
    assert "window (next gate's first 5):" in r.stdout
    assert "post-window tail:" in r.stdout

    m = re.search(r"registry: (\d+) queries, (\d+) oracle twins",
                  r.stdout)
    assert m, r.stdout.splitlines()[:3]
    from pyspark_etl_project_spark.plans.registry import _raw_maps
    queries, oracle = _raw_maps()
    assert int(m.group(1)) == len(queries)
    assert int(m.group(2)) == len(oracle)

    # The window section lists exactly 5 names, each with an rNN or
    # r-1 label.
    window_lines = [
        ln for ln in r.stdout.splitlines()
        if re.match(r"^  r\s*-?\d+ \S+$", ln)
    ]
    assert len(window_lines) >= 5
