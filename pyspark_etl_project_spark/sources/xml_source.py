"""XML record parsing (A3): one <RECORD> string per row, 14 child tags.

Reference: /root/reference/ETL/XML_Batch_Processing.py:111-137 — a
driver-side ElementTree loop over collected strings. Here parsing runs
ON EXECUTORS via Spark 4's native from_xml; the archive's
(ARCHIVE_ID, STREAM_RECORD_ID, STREAMING_DATA) rows keep their ids as
watermark/version columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_etl_project_spark.functions.reserved import require_free_columns
from pyspark_etl_project_spark.schemas import XML_RECORD_FIELDS

_XML_SCHEMA_DDL = ", ".join(f"{f} STRING" for f in XML_RECORD_FIELDS)


def parse_xml_records(df: DataFrame, xml_col: str = "STREAMING_DATA",
                      keep_cols: list[str] | None = None) -> DataFrame:
    """Parse <RECORD> XML strings into 14 string columns (typed later by
    the pipeline's casts, same as the reference).

    ``_rec`` is reserved: non-xml caller columns pass through to the
    output, so a caller's own ``_rec`` would be silently replaced by
    the parse struct (r17 audit — confirmed live)."""
    require_free_columns(df, ["_rec"], "parse_xml_records")
    parsed = df.withColumn("_rec", _from_xml(F.col(xml_col)))
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != xml_col]
    return parsed.select(*keep, "_rec.*")


def _from_xml(col: Column) -> Column:
    return F.from_xml(col, F.lit(f"STRUCT<{_XML_SCHEMA_DDL}>"))


def parse_xml_records_quarantined(df: DataFrame,
                                  xml_col: str = "STREAMING_DATA",
                                  ) -> tuple[DataFrame, DataFrame]:
    """Split (good, quarantine): records from_xml cannot parse into any
    field keep their raw payload for the reject table instead of
    flowing on as all-null rows."""
    require_free_columns(df, ["_rec"], "parse_xml_records_quarantined")
    parsed = df.withColumn("_rec", _from_xml(F.col(xml_col)))
    # A malformed record parses to a struct of all-null fields — detect
    # by every child being null (a valid RECORD always carries at least
    # its identifier tag).
    all_null = F.lit(True)
    for f in XML_RECORD_FIELDS:
        all_null = all_null & F.col(f"_rec.{f}").isNull()
    bad = parsed.filter(all_null).select(*df.columns)
    keep = [c for c in df.columns if c != xml_col]
    good = parsed.filter(~all_null).select(*keep, "_rec.*")
    return good, bad


def xml_record_string(values: dict[str, str | None]) -> str:
    """Serialize a RECORD element (fixture/generator helper, mirroring
    Data_Generators/XML_data_generator.py:83-119 tag layout)."""
    parts = ["<RECORD>"]
    for f in XML_RECORD_FIELDS:
        v = values.get(f)
        if v is not None:
            parts.append(f"<{f}>{v}</{f}>")
    parts.append("</RECORD>")
    return "".join(parts)
