"""Pins for tools/bench_diff.py's edge handling (r16 ADVICE item 3):
zero-old-time queries must be excluded from ratio stats LOUDLY, the
shared-set totals division must not raise, and a path that is neither
a file nor a git ref must produce a clear one-line error instead of a
raw CalledProcessError.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "bench_diff.py")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run([sys.executable, _TOOL, *args],
                          capture_output=True, text=True)


def _write(tmp_path, name: str, queries: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries}))
    return str(p)


def test_zero_old_time_reported_and_total_guarded(tmp_path):
    new = _write(tmp_path, "new.json", {"a": 1.0, "b": 2.0})
    old = _write(tmp_path, "old.json", {"a": 0.0, "b": 1.0})
    r = _run(new, old)
    assert r.returncode == 0, r.stderr
    assert "excluded from ratio stats" in r.stdout
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["zero_old_excluded"] == ["a"]
    # 'a' stays in shared and in the totals; ratio stats use only 'b'.
    assert summary["shared"] == 2
    assert summary["median_ratio"] == 2.0
    assert summary["total_ratio"] == 3.0


def test_all_zero_old_total_is_nan_not_crash(tmp_path):
    new = _write(tmp_path, "new.json", {"a": 1.0})
    old = _write(tmp_path, "old.json", {"a": 0.0})
    r = _run(new, old)
    assert r.returncode == 0, r.stderr
    assert "ZeroDivisionError" not in r.stderr
    assert "nan" in r.stdout.lower()


def test_bad_ref_is_one_clear_line(tmp_path):
    new = _write(tmp_path, "new.json", {"a": 1.0})
    r = _run(new, "no-such-ref-xyz")
    assert r.returncode != 0
    assert "neither a readable JSON file nor" in (r.stdout + r.stderr)
    assert "Traceback" not in r.stderr


def test_clean_compare_unchanged(tmp_path):
    new = _write(tmp_path, "new.json", {"a": 1.0, "b": 4.0})
    old = _write(tmp_path, "old.json", {"a": 2.0, "b": 2.0})
    r = _run(new, old)
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["zero_old_excluded"] == []
    assert summary["regressions_gt_1_25"] == ["b"]
    assert summary["improvements_lt_0_8"] == ["a"]
    assert summary["median_ratio"] == 1.25
    assert summary["total_ratio"] == 1.25


def test_floor_normalized_line_and_warmup_note(tmp_path):
    p_new = tmp_path / "new.json"
    p_new.write_text(json.dumps({
        "queries": {"scd2_merge": 1.6, "b": 1.0},
        "noise_floor": {"min": 0.2}}))
    p_old = tmp_path / "old.json"
    p_old.write_text(json.dumps({
        "queries": {"scd2_merge": 0.8, "b": 1.0},
        "noise_floor": {"min": 0.1}}))
    r = _run(str(p_new), str(p_old))
    assert r.returncode == 0, r.stderr
    assert "CPU-floor drift: 2.00x" in r.stdout
    assert "warmup-sensitive" in r.stdout
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["floor_ratio"] == 2.0
    # totals 2.6/1.8 = 1.444..; net of the 2x floor drift = 0.722
    assert summary["total_ratio_net_of_floor"] == 0.722
    assert summary["warmup_sensitive_regressions"] == ["scd2_merge"]


def test_no_floor_fields_when_floor_absent(tmp_path):
    new = _write(tmp_path, "new.json", {"a": 1.0})
    old = _write(tmp_path, "old.json", {"a": 1.0})
    r = _run(new, old)
    assert r.returncode == 0, r.stderr
    assert "CPU-floor drift" not in r.stdout
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["floor_ratio"] is None
    assert summary["total_ratio_net_of_floor"] is None
    assert summary["warmup_sensitive_regressions"] == []


def test_module_importable_for_coverage():
    spec = importlib.util.spec_from_file_location("bench_diff", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
