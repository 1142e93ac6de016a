"""Dimension lookup as broadcast hash join.

Replaces the reference's per-row SQLite lookup UDFs (C4/I1-I3,
/root/reference/ETL/CSV_Batch_Processing.py:91-147 and
ETL/DB_Lookup.py:24-54) — which opened a database connection per row per
dimension — with a prepared, deduplicated dimension broadcast-joined in
the JVM.

Reference lookup semantics to reproduce exactly
(ETL/DB_Lookup.py:48-54): SELECT DISTINCT id WHERE SOURCE_ID=? AND
key=? AND ACTIVE_FLAG=1 ORDER BY START_DATE DESC, take first row. The
seeded dims contain intentional duplicates (e.g. PROMO-SEEKER twice,
Setup/SQL_DML_Script.sql:425-429) that the top-1-by-START_DATE collapses.

Scale: dims are thousands of rows — always broadcast; the fact side never
shuffles for a lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.reserved import require_free_columns


def prepare_dimension(dim: DataFrame,
                      key_col: str,
                      id_col: str,
                      source_id: int | None = None,
                      order_col: str = "START_DATE",
                      single_partition: bool = True) -> DataFrame:
    """Active rows, optional source filter, newest-START_DATE winner per
    key — yields a unique (key -> id) mapping ready to broadcast.

    ``single_partition=True`` (the tiny-seed default) coalesces the
    frame to one partition BEFORE the dedup window: a single partition
    satisfies the window's clustering requirement, so no Exchange is
    planned for it (guide §2.4). That is sound at exactly the scale
    the seeded dimensions promise (thousands of rows — the result is
    ALWAYS broadcast by lookup_join, so the dimension must fit on one
    executor anyway), but it bounds only the deduped OUTPUT, not the
    input: coalesce propagates upstream, so a FACT-scale pre-dedup
    input would scan, filter and window-sort in ONE task (r17 ADVICE —
    single-task sort with spill/OOM risk at 100 TB). Callers preparing
    a large input pass ``single_partition=False`` to keep the hash
    exchange on ``key_col`` so the dedup parallelizes; only the
    already-deduped one-row-per-key result then feeds the broadcast."""
    require_free_columns(dim, ["_rn"], "prepare_dimension")
    d = dim.filter(F.col("ACTIVE_FLAG") == 1)
    if source_id is not None:
        d = d.filter(F.col("SOURCE_ID") == source_id)
    if single_partition:
        d = d.coalesce(1)
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col).desc())
    return (d.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select(key_col, id_col))


def lookup_join(fact: DataFrame,
                dim_prepared: DataFrame,
                fact_key: str,
                dim_key: str,
                id_col: str,
                out_col: str) -> DataFrame:
    """Left broadcast join mapping fact_key -> id; miss -> null (feeds the
    IS_VALID_DATA flag downstream, same as a failed UDF lookup).

    ``_lk`` is reserved on BOTH sides: the final name-based
    ``drop("_lk")`` removes every column of that name, so a fact-side
    ``_lk`` would be silently destroyed (r16 ADVICE — confirmed live),
    and a dim-side one would duplicate under the rename."""
    require_free_columns(fact, ["_lk"], "lookup_join")
    require_free_columns(dim_prepared, ["_lk"], "lookup_join")
    d = dim_prepared.withColumnRenamed(dim_key, "_lk").withColumnRenamed(id_col, out_col)
    out = fact.join(F.broadcast(d), fact[fact_key] == d["_lk"], "left").drop("_lk")
    return out
