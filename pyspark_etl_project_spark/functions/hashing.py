"""Row fingerprinting and natural-key derivation (pure column expressions).

Reference semantics (H1/H2 in SURVEY.md §2.H):
- fingerprint = md5(concat_ws("||", coalesce(c, 'NULL') for c in columns))
  over the *current* columns in per-source order
  (/root/reference/ETL/CSV_Batch_Processing.py:80-83, JSON:98-103,
  XML:163-168).
- natural key = "<SOURCE> - <id>" (CSV:84-86, JSON:105-107, XML:170-172).

All JVM-side built-ins — stays inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(df_or_cols: DataFrame | Sequence[str],
                    null_token: str = "NULL",
                    sep: str = "||") -> Column:
    """MD5 fingerprint over the given columns (or all columns of a frame),
    null-safe via per-column coalesce, in the given order.

    Column order matters: each source pipeline hashes its own column order,
    and CDC DUPLICATE/UPDATE routing depends on byte-identical re-hashes.
    """
    if isinstance(df_or_cols, DataFrame):
        cols = df_or_cols.columns
    else:
        cols = list(df_or_cols)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(null_token)) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))


def source_system_identifier(source_name: str, id_col: str) -> Column:
    """Source-qualified natural key: '<SOURCE> - <id>'."""
    return F.concat(F.lit(f"{source_name} - "), F.col(id_col).cast("string"))
