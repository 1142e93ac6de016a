"""Arrow-vectorized pandas UDFs — the two surfaces the engine's
Python-API matrix was missing next to mapInPandas (multimodal),
applyInPandas (groupmap), applyInPandasWithState (streaming/stateful)
and the UDTF (sentence split):

- a SCALAR pandas_udf (vectorized column function — one Arrow batch per
  call, ~10-100x a row-at-a-time Python UDF);
- a GROUPED_AGG pandas_udf (whole-group reduction to a scalar, usable
  inside ``groupBy().agg`` alongside built-ins).

Both compute pure integer results so the DuckDB oracle replays them
exactly (`pandas_udf_surface`). They exist to prove the API surface
with gate-checkable semantics — for these particular functions the
built-in expressions would be faster; real deployments put genuinely
non-expressible logic (model scoring, tokenizers) behind the same
signatures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("int")
def vowel_count(s: pd.Series) -> pd.Series:
    """Vectorized vowel counter (scalar pandas UDF). NULL in → NULL
    out, like a built-in expression: str.count gives NaN for nulls and
    the NULLABLE Int32 dtype carries it to an Arrow null (a plain
    int32 astype would raise on the NaN and kill the task)."""
    return s.str.count("[aeiou]").astype("Int32")


@pandas_udf("long")
def weighted_mean_trunc(v: pd.Series, w: pd.Series) -> int:
    """Grouped-agg pandas UDF: trunc(Σ(v·w) / Σw) in exact Python
    integers (pandas int64 sums, then sign-stripped // — no float
    path). TRUNCATION toward zero, not floor: the DuckDB oracle's
    integer `//` truncates while Python's floors, and the two differ
    by 1 whenever Σ(v·w) is negative — pin the oracle's semantics
    explicitly (same pattern as audio_mixdown_stats).

    NULL handling mirrors the SQL twin's independent SUMs: the
    numerator skips rows where EITHER factor is null (a null product
    never reaches SQL SUM), the denominator skips only null weights —
    an int64 astype over raw NaNs would instead raise and kill the
    task."""
    pm = v.notna() & w.notna()
    num = int((v[pm].astype("int64") * w[pm].astype("int64")).sum())
    den = int(w[w.notna()].astype("int64").sum())
    if not den:
        return 0
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q
