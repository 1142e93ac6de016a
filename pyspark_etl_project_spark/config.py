"""Paths and run constants.

Replaces the reference's Parameters.ini machinery
(/root/reference/Setup/Params_Setup.py:19-44) with plain Python config.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# SCD2 sentinel expiry used by the reference
# (/root/reference/ETL/CSV_Batch_Processing.py:196: datetime 2099-12-31).
SCD2_OPEN_END_DATE = "2099-12-31 00:00:00"

# Source registry mirroring CSD_SOURCES seeds
# (/root/reference/Setup/SQL_DML_Script.sql:1-19).
SOURCES = {
    "AMAZON": 1,
    "UBER": 2,
    "AT&T": 3,
}


@dataclass(frozen=True)
class MartPaths:
    """Lakehouse layout: mart partitioned by SOURCE_ID so per-source loads
    rewrite one partition, and the SOURCE_ID filter becomes partition
    pruning at any scale."""

    root: str

    @property
    def mart(self) -> str:
        return os.path.join(self.root, "csd_data_mart")

    @property
    def audit(self) -> str:
        return os.path.join(self.root, "csd_data_loads")

    @property
    def archive(self) -> str:
        return os.path.join(self.root, "streaming_data_archive")

    @property
    def watermarks(self) -> str:
        return os.path.join(self.root, "watermarks")
