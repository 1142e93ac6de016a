"""Reserved internal column-name guard.

Several operators stage fixed-name helper columns on the CALLER's
frame (``_rn``, ``_salt``, ``_bucket``, ``_ts``...) and drop them on
the way out. If the input already carries a column with one of those
names, ``withColumn`` silently REPLACES it — the user's column is
destroyed (or, worse, emitted with engine-internal values: the old
asof_join would return a caller's ``_side`` column as lit(1)).

No registered query and none of the engine's own pipelines use
underscore-prefixed input columns, so the collision can only come from
an external caller — exactly the latent class the round-16
``dedup_lines_in_doc`` separator fix came from (a hazard reachable
only through arguments/inputs no internal caller uses). The contract
is: these names are reserved, and a colliding input fails LOUDLY at
plan-build time instead of silently losing data at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def require_free_columns(df: DataFrame, names: list[str], op: str) -> None:
    """Raise if ``df`` already carries any of the reserved ``names``.

    Called at plan-build time (no Spark action); the error names both
    the operator and the colliding columns so the caller can rename.
    """
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with reserved internal "
            f"staging names; rename them before calling (underscore-"
            f"prefixed helper columns are engine-reserved)")
