"""Incremental aggregate maintenance (materialized-rollup merge).

The pattern that keeps a 100 TB rollup fresh without rescanning
history: persist the aggregate STATE table (one row per group, one
column per metric partial), and fold each arriving batch in as
``merge_agg_state(state, partial_agg(batch))``. Only
commutative/associative partials are allowed (count→sum, sum, min,
max), so merging is itself a plain groupBy — order- and
batching-insensitive, which is what makes replays and backfills safe.
(Non-decomposable metrics — exact distinct, exact percentiles — need
their own state, e.g. a key set or a sketch; deliberately not
conflated here.)

Scale: each merge shuffles only ``|state| + |batch partial|`` rows —
both aggregate-sized (distinct groups, not events). The state table
never grows past the group count, and a batch's partial agg is
map-side combined before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metric name -> (batch aggregation, state merge aggregation)
_AGGS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_agg(batch: DataFrame, keys: list[str],
                metrics: dict[str, tuple[str, str]]) -> DataFrame:
    """One batch's decomposable partials: ``metrics`` maps output column
    -> (agg kind, input column); kind in count/sum/min/max ("count"
    ignores the input column).

    "sum" REQUIRES an integral input column (the repo-wide exactness
    rule: quantize money/measures to integer cents/micro-units first).
    Partials are stored as longs; silently casting a fractional sum to
    long would truncate a little more state on EVERY batch merge, so a
    fractional column is rejected up front instead."""
    # df.dtypes returns Spark simpleStrings: ByteType -> 'tinyint',
    # ShortType -> 'smallint', IntegerType -> 'int', LongType ->
    # 'bigint' ('byte'/'long'/'integer' never appear there).
    integral = ("tinyint", "smallint", "int", "bigint")
    dtypes = dict(batch.dtypes)
    aggs = []
    for out, (kind, col) in metrics.items():
        if kind == "sum" and dtypes.get(col) not in integral:
            raise ValueError(
                f"partial_agg sum over non-integral column {col!r} "
                f"({dtypes.get(col)}): quantize to integer units "
                "(e.g. cents via decimal(18,6)*100 -> long) first — "
                "long-cast partials would truncate per batch")
        batch_fn, _ = _AGGS[kind]
        expr = batch_fn(col)
        if kind in ("count", "sum"):
            expr = expr.cast("long")
        aggs.append(expr.alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_agg_state(state: DataFrame, batch_partial: DataFrame,
                    keys: list[str],
                    metrics: dict[str, tuple[str, str]]) -> DataFrame:
    """Fold a batch's partials into the state table. Counts and sums
    add; mins/maxes combine; groups new to either side pass through
    (full outer semantics via union + re-aggregate)."""
    aggs = []
    for out, (kind, _col) in metrics.items():
        _, merge_fn = _AGGS[kind]
        expr = merge_fn(out)
        if kind in ("count", "sum"):
            expr = expr.cast("long")
        aggs.append(expr.alias(out))
    return (state.unionByName(batch_partial)
            .groupBy(*keys).agg(*aggs))


def incremental_join_view(view: DataFrame, delta: DataFrame,
                          dim: DataFrame, on,
                          broadcast_dim: bool = True) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view: the new
    fact rows (``delta``) join the dimension and UNION onto the
    existing view — the standard IVM delta rule for an inner
    equi-join where only the fact side receives inserts
    (ΔV = Δfact ⋈ dim). The materialized view is never recomputed and
    the fact history is never rescanned; at 100 TB the per-batch cost
    is |Δ| ⋈ dim (broadcast when the dim fits), not |fact| ⋈ dim.

    Column contract: ``view`` already has the joined shape; the
    delta⋈dim result is column-pruned + reordered to match it.
    ``broadcast_dim=False`` drops the broadcast hint for dimensions too
    big to ship to every executor — the join falls back to Catalyst's
    choice (shuffled hash / sort-merge) instead of a broadcast OOM."""
    enriched = delta.join(F.broadcast(dim) if broadcast_dim else dim, on)
    return view.unionByName(enriched.select(*view.columns))
