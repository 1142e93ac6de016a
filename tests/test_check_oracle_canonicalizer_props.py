"""Hypothesis property pins for tools/check_oracle.py's canonicalizer —
the digest's invariants hold for arbitrary frames, not just the
handwritten examples in test_check_oracle_canonicalizer.py.

Separate module (r15 ADVICE): an unconditional mid-file hypothesis
import made the whole canonicalizer module fail at collection when
hypothesis is absent, taking the non-hypothesis pins down with it.
Here importorskip may legitimately skip EVERYTHING — every test in
this file needs hypothesis.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TOOL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "check_oracle.py")

spec = importlib.util.spec_from_file_location("check_oracle", _TOOL_PATH)
check_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check_oracle)

norm_value = check_oracle.norm_value
frame_digest = check_oracle.frame_digest

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=8),
    st.booleans(),
)


@st.composite
def _frames(draw):
    ncols = draw(st.integers(min_value=1, max_value=4))
    # Distinct names case-insensitively: the digest sorts columns by
    # lower-cased name, so case-duplicate names would make the column
    # order genuinely ambiguous (real query output never has them).
    cols = draw(st.lists(st.text(min_size=1, max_size=6),
                         min_size=ncols, max_size=ncols,
                         unique_by=lambda c: c.lower()))
    rows = draw(st.lists(
        st.tuples(*[_cell for _ in range(ncols)]), max_size=6))
    return cols, rows


@settings(max_examples=200, deadline=None)
@given(frame=_frames(), data=st.data())
def test_frame_digest_permutation_invariant(frame, data):
    """The driver sorts columns by name and treats rows as a multiset;
    the digest must be invariant under ANY column permutation (with
    cells moved along) and ANY row permutation — for arbitrary frames,
    not just the examples pinned above."""
    cols, rows = frame
    perm = data.draw(st.permutations(range(len(cols))))
    cols_p = [cols[i] for i in perm]
    rows_p = [tuple(r[i] for i in perm) for r in rows]
    rows_p = data.draw(st.permutations(rows_p))
    assert frame_digest(cols_p, list(rows_p)) == frame_digest(cols, rows)


@settings(max_examples=200, deadline=None)
@given(frame=_frames(), data=st.data())
def test_frame_digest_single_cell_change_changes_digest(frame, data):
    """Any single-cell change that norm_value can distinguish must
    change the digest — the value-sensitivity half of the contract
    (ROW multiset, so a changed row that collides with another
    pre-existing identical row still changes the multiset)."""
    cols, rows = frame
    if not rows:
        return
    ri = data.draw(st.integers(min_value=0, max_value=len(rows) - 1))
    ci = data.draw(st.integers(min_value=0, max_value=len(cols) - 1))
    new = data.draw(_cell)
    old = rows[ri][ci]
    if norm_value(new) == norm_value(old):
        return  # indistinguishable by design (e.g. same float)
    rows2 = [tuple(r) for r in rows]
    rows2[ri] = tuple(new if j == ci else v
                      for j, v in enumerate(rows2[ri]))
    assert frame_digest(cols, rows2) != frame_digest(cols, rows)
