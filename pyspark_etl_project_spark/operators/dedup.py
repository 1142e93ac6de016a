"""Keep-latest dedup (greatest-n-per-group).

Reference E1/D1 (SURVEY.md §2.E): row_number over
Window.partitionBy(natural_key), keep row 1
(/root/reference/ETL/CSV_Batch_Processing.py:69-77, JSON:87-95,
XML:153-161).

The reference orders by the partition key itself (constant within the
partition), making the survivor nondeterministic; the *intent* is
"keep the latest occurrence" (updates are appended later —
Data_Generators/CSV_data_generator.py:143-148). We require an explicit
deterministic ordering column (file position, ARCHIVE_ID, ingest id).

Scale note: a window over partitionBy(key) is one hash shuffle on the
key — same cost as groupBy. Skewed keys are handled by AQE skew-join
settings; for extreme skew prefer the max_by formulation (map-side
partial aggregation) via ``use_max_by=True``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(df: DataFrame,
                keys: Sequence[str] | str,
                order_by: Sequence[str] | str,
                descending: bool = True,
                use_max_by: bool = False) -> DataFrame:
    """One row per key group: the greatest (default) by ``order_by``.

    ``use_max_by=True`` computes the same result with
    groupBy + max_by(struct(*), struct(order_cols)) which enables partial
    (map-side) aggregation — fewer shuffled rows when duplicates are many.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    if use_max_by:
        ord_struct = F.struct(*[F.col(c) for c in order_by])
        if not descending:
            # max_by keeps the max ordering struct; flip sign-ambiguous
            # orderings by using min_by for ascending.
            picked = F.min_by(F.struct(*[F.col(c) for c in df.columns]), ord_struct)
        else:
            picked = F.max_by(F.struct(*[F.col(c) for c in df.columns]), ord_struct)
        out = df.groupBy(*keys).agg(picked.alias("_row"))
        return out.select("_row.*")

    from pyspark_etl_project_spark.functions.reserved import (
        require_free_columns)

    require_free_columns(df, ["_rn"], "keep_latest")
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))
