"""Per-source unit/format normalization as pure column expressions.

The reference implements these as withColumn chains and one Python row-UDF;
our engine is 100% built-in functions (JVM-side, codegen-friendly).

Reference semantics (SURVEY.md §2.H/§2.I):
- H3  three timestamp formats (CSV MMddyyyyHHmmss:170, JSON
  dd/MM/yyyy HH:mm:ss:83, XML yyyyMMddHHmmss:141)
- H11 WORST/BAD/NEUTRAL/GOOD/BEST -> 1..5 (CSV:185-189)
- H6  1-10 rating -> floor(r/2), so rating 1 -> 0 — quirk preserved
  (JSON:209)
- H12 YES/NO and TRUE/FALSE -> 1/0/null, case-insensitive (JSON:201-206,
  XML:219-224)
- I4  "H:MM:SS" -> seconds, null-safe (XML:100-108) — replaced by column
  arithmetic, no UDF
- H10 IS_VALID_DATA = 0 iff any checked column is null (CSV:200-217)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

TIMESTAMP_FORMATS = {
    "AT&T": "MMddyyyyHHmmss",
    "AMAZON": "dd/MM/yyyy HH:mm:ss",
    "UBER": "yyyyMMddHHmmss",
}

_RATING_WORDS = {"WORST": 1, "BAD": 2, "NEUTRAL": 3, "GOOD": 4, "BEST": 5}


def rating_words_to_score(col: Column | str) -> Column:
    """CSV rating words -> 1..5 (unknown/null -> null)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("int")
    for word, score in reversed(list(_RATING_WORDS.items())):
        expr = F.when(F.upper(c) == word, F.lit(score)).otherwise(expr)
    return expr


def rating_ten_to_five(col: Column | str) -> Column:
    """JSON 1-10 rating -> floor(r/2): note 1 -> 0, reproduced exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("int") / 2).cast("int")


def yes_no_to_flag(col: Column | str) -> Column:
    """YES/NO -> 1/0, case-insensitive; anything else null."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(F.upper(c) == "YES", 1)
             .when(F.upper(c) == "NO", 0)
             .otherwise(F.lit(None).cast("int")))


def true_false_to_flag(col: Column | str) -> Column:
    """TRUE/FALSE -> 1/0, case-insensitive; anything else null."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(F.upper(c) == "TRUE", 1)
             .when(F.upper(c) == "FALSE", 0)
             .otherwise(F.lit(None).cast("int")))


def duration_to_seconds(col: Column | str) -> Column:
    """'H:MM:SS' -> integer seconds; null/malformed -> null.

    Replaces the reference's Python UDF
    (/root/reference/ETL/XML_Batch_Processing.py:100-108) with split+cast
    column arithmetic — stays in whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    ok = c.rlike(r"^\d+:\d{1,2}:\d{1,2}$")
    secs = (parts.getItem(0).cast("int") * 3600
            + parts.getItem(1).cast("int") * 60
            + parts.getItem(2).cast("int"))
    return F.when(ok, secs).otherwise(F.lit(None).cast("int"))


def validity_flag(cols: Sequence[str]) -> Column:
    """IS_VALID_DATA: 0 if any checked column is null, else 1."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | F.col(c).isNull()
    return F.when(pred, 0).otherwise(1)
