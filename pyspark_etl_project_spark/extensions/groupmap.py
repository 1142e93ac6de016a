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
    drift) — value-level checkable against a window-function oracle.

    NULL values normalize to NULL (min/max skip them, as SQL's do);
    the group column's output type follows the input schema rather
    than assuming string."""
    import pandas as pd  # noqa: F401 (Arrow path requires pandas)

    gtype = dict(df.dtypes)[group_col]
    out_schema = f"{id_col} long, {group_col} {gtype}, {out_col} long"

    def norm(pdf):
        import math

        import pandas as pd

        lo = pdf[value_col].min()
        hi = pdf[value_col].max()
        span = hi - lo
        if pd.isna(span) or span == 0:
            bp = [None if pd.isna(v) else 0 for v in pdf[value_col]]
        else:
            bp = [None if pd.isna(v)
                  else int(math.floor((v - lo) * 10000 / span))
                  for v in pdf[value_col]]
        return pdf.assign(**{out_col: bp})[[id_col, group_col, out_col]]

    return df.groupBy(group_col).applyInPandas(norm, schema=out_schema)


def cogrouped_click_purchase_stats(clicks: DataFrame,
                                   purchases: DataFrame) -> DataFrame:
    """Cogrouped-map Pandas surface (``cogroup().applyInPandas``) —
    the one Arrow API the matrix lacked: both sides of a key arrive as
    pandas frames IN THE SAME call, for logic that genuinely needs
    simultaneous access to two grouped inputs (here: how many of a
    user's clicks precede their FIRST purchase — a per-user sequence
    alignment an equi-join would need a window + join to express).
    Integer outputs only, so the whole computation is oracle-gated.

    Scale: one co-partitioned shuffle on the user key for both sides;
    per-call memory is one user's rows."""
    import pandas as pd

    def stats(key, cdf: "pd.DataFrame", pdf: "pd.DataFrame"):
        n_clicks = len(cdf)
        n_purch = len(pdf)
        if n_purch == 0:
            before = n_clicks
        else:
            first = pdf["t"].min()
            before = int((cdf["t"] < first).sum()) if n_clicks else 0
        return pd.DataFrame(
            [(key[0], n_clicks, n_purch, before)],
            columns=["user_id", "n_clicks", "n_purchases",
                     "clicks_before_first_purchase"])

    return (clicks.groupBy("user_id")
            .cogroup(purchases.groupBy("user_id"))
            .applyInPandas(stats,
                           schema=("user_id long, n_clicks long, "
                                   "n_purchases long, "
                                   "clicks_before_first_purchase long")))
