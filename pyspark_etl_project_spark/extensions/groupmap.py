"""Grouped-map Pandas UDF surface (batch ``applyInPandas``): whole-group
transforms the built-in aggregates can't express row-wise, executed as
one Arrow batch per group.

Completes the engine's Python-surface matrix alongside mapInPandas
(multimodal.py), applyInPandasWithState (streaming/stateful.py), and the
UDTF (text.py). The reference's four UDFs (SURVEY.md §2.I) are lookups/
column math and stay JVM-side; this surface exists for genuinely
group-shaped logic.

Scale notes: one shuffle on the group key; each group must fit an
executor's Arrow batch (grouped-map's contract) — keys here are
low-cardinality categories, not unbounded ids. Only expressions without
accumulation order (per-row IEEE ops against group min/max) are used, so
results are bit-identical to the SQL-window formulation the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def minmax_normalize(df: DataFrame, group_col: str, value_col: str,
                     id_col: str, out_col: str = "value_bp") -> DataFrame:
    """Per-group min-max normalization to integer basis points:
    floor((x - min) * 10000 / (max - min)); constant groups map to 0.

    Pandas computes the same scalar double expression per row that a SQL
    window formulation would (no accumulation, so no summation-order
    drift) — value-level checkable against a window-function oracle."""
    import pandas as pd  # noqa: F401 (Arrow path requires pandas)

    out_schema = f"{id_col} long, {group_col} string, {out_col} long"

    def norm(pdf):
        import math

        lo = pdf[value_col].min()
        hi = pdf[value_col].max()
        span = hi - lo
        if span == 0:
            bp = [0] * len(pdf)
        else:
            bp = [int(math.floor((v - lo) * 10000 / span))
                  for v in pdf[value_col]]
        return pdf.assign(**{out_col: bp})[[id_col, group_col, out_col]]

    return df.groupBy(group_col).applyInPandas(norm, schema=out_schema)
