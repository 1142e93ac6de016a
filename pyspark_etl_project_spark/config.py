"""Run constants.

Replaces the reference's Parameters.ini machinery
(/root/reference/Setup/Params_Setup.py:19-44) with plain Python config.
Path selection deliberately stays with the callers (bench.py and
tools/check_oracle.py read SPARK_GRAFT_SF_DIR per run) — an
import-time snapshot here once drifted from the per-run env reads and
was removed along with the unused source-registry/mart-path surface.
"""

from __future__ import annotations

# SCD2 sentinel expiry used by the reference
# (/root/reference/ETL/CSV_Batch_Processing.py:196: datetime 2099-12-31).
SCD2_OPEN_END_DATE = "2099-12-31 00:00:00"
