"""Pins for tools/check_oracle.py's value canonicalizer — the local
stand-in for the external gate's compare. Two separate rounds of red
gate rows came from this canonicalizer being LAXER than the driver's
(r1: array cells, r2: HUGEINT→float64 dtype drift), so its strictness
rules are load-bearing: float repr (bit-exact, and '3.0' must differ
from int '3'), NULL/NaN/bool/bytes/datetime normalization, and an
order-insensitive frame digest that is still value-sensitive.

main()'s Spark-side guards (complex-column rejection, the pandas
sort_values driver simulation) run inside the sweep itself and are
exercised by every oracle run; only the pure functions are pinned here.
"""

from __future__ import annotations

import datetime
import importlib.util
import os

import numpy as np
import pandas as pd

_TOOL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "check_oracle.py")

spec = importlib.util.spec_from_file_location("check_oracle", _TOOL_PATH)
check_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracle)

norm_value = check_oracle.norm_value
frame_digest = check_oracle.frame_digest


def test_norm_value_floats_are_repr_and_distinct_from_ints():
    # The r2 lesson: DuckDB HUGEINT → pandas float64 ('3.0') while a
    # Spark long stays int64 ('3'). The canonicalizer must PRESERVE
    # that difference so the laxer-than-driver failure mode can't
    # recur — an int and an equal-valued float never collide.
    assert norm_value(3) == "3"
    assert norm_value(3.0) == "3.0"
    assert norm_value(3) != norm_value(3.0)
    # repr is bit-exact: 0.1 + 0.2 != 0.3 survives normalization.
    assert norm_value(0.1 + 0.2) == "0.30000000000000004"
    assert norm_value(0.3) == "0.3"
    assert norm_value(float("nan")) == "NaN"


def test_norm_value_numpy_scalars_and_arrays_unwrap():
    assert norm_value(np.int64(7)) == "7"
    assert norm_value(np.float64(2.5)) == "2.5"
    assert norm_value(np.bool_(True)) == "1"
    assert norm_value(np.array([1.0, 2.0])) == "[1.0,2.0]"


def test_norm_value_null_bool_bytes_datetime():
    assert norm_value(None) == "NULL"
    assert norm_value(pd.NaT) == "NULL"
    # bools normalize to ints — Spark tinyint vs DuckDB BOOLEAN parity.
    assert norm_value(True) == "1"
    assert norm_value(False) == "0"
    assert norm_value(b"\x00\xff") == "00ff"
    assert norm_value(datetime.datetime(2024, 3, 1, 12, 30, 5)) \
        == "2024-03-01 12:30:05"
    assert norm_value(datetime.date(2024, 3, 1)) == "2024-03-01"
    assert norm_value([1, None, "x"]) == "[1,NULL,x]"


def test_frame_digest_order_insensitive_value_sensitive():
    cols_a, rows_a = ["b", "A"], [(1, "x"), (2, "y")]
    # Same data: columns given in the other order (cells swapped to
    # match), rows permuted — the digest must be identical.
    cols_b, rows_b = ["A", "b"], [("y", 2), ("x", 1)]
    assert frame_digest(cols_a, rows_a) == frame_digest(cols_b, rows_b)
    # One changed value must change the digest.
    assert frame_digest(cols_a, [(1, "x"), (2, "z")]) \
        != frame_digest(cols_a, rows_a)
    # int vs equal float in a cell must change the digest (the HUGEINT
    # class of driver mismatch, end-to-end through the hash).
    assert frame_digest(["v"], [(3,)]) != frame_digest(["v"], [(3.0,)])
    # Column ORDERING sensitivity, not name sensitivity: the digest
    # never hashes column names (mirroring the driver, which sorts
    # columns by name and hashes values — names are the separate
    # schema_match check). A rename changes the digest ONLY when it
    # changes the case-insensitive sort position of the column, as
    # here ('b'→'c' moves past nothing but re-pairs against 'A'):
    assert frame_digest(["A", "c"], rows_a) != frame_digest(cols_a, rows_a)
    # ...and a sort-position-preserving rename is digest-INVISIBLE by
    # design (r14 ADVICE: this is deliberate, schema_match catches it):
    assert frame_digest(["bb", "A"], rows_a) == frame_digest(cols_a, rows_a)


# The hypothesis property pins for these functions live in
# tests/test_check_oracle_canonicalizer_props.py (r15 ADVICE: an
# unconditional hypothesis import here took these non-hypothesis pins
# down at collection when hypothesis is absent).
