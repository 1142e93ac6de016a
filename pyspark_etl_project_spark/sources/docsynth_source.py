"""Custom batch data source via the Python DataSource API (Spark 4).

`docsynth` generates a deterministic synthetic corpus-metadata table —
the extensibility path for feeding Spark from a system with no built-in
connector, expressed the engine-native way: the source declares its
schema and its input partitions, Spark schedules one task per
partition, and each task emits Arrow RecordBatches (columnar, no
per-row Python objects in the hot loop).

Scale design: the row range is split evenly across ``partitions``
input splits, so read parallelism is declared by the source, not
inherited from one driver-side list; generation is vectorized numpy
integer arithmetic (multiplicative hashing, no RNG state), so any
split regenerates its rows identically on retry — the idempotence a
speculative/retried 1000-executor read requires. The same arithmetic
is SQL-expressible, which is what lets the DuckDB oracle replay it
(`python_datasource_scan`).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LANGS = ["en", "de", "fr", "es"]
_HASH_MULT = 2654435761          # Knuth multiplicative hash constant
_HASH_MOD = 4294967296           # 2^32
_CHK_MULT = 1315423911
_CHK_MOD = 1000000007


class DocSynthDataSource(DataSource):
    """`spark.read.format("docsynth").option("n_docs", N)
    .option("partitions", P).load()`"""

    @classmethod
    def name(cls) -> str:
        return "docsynth"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_tokens int, checksum bigint"

    def reader(self, schema) -> "DocSynthReader":
        return DocSynthReader(int(self.options.get("n_docs", 1000)),
                              int(self.options.get("partitions", 4)))


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DocSynthReader(DataSourceReader):
    def __init__(self, n_docs: int, partitions: int):
        if n_docs < 0 or partitions < 1:
            raise ValueError(f"bad docsynth options: {n_docs=} {partitions=}")
        self.n_docs, self.n_parts = n_docs, partitions

    def partitions(self) -> list[_Range]:
        if self.n_docs == 0:
            return [_Range(0, 0)]
        per = -(-self.n_docs // self.n_parts)  # ceil
        return [_Range(lo, min(lo + per, self.n_docs))
                for lo in range(0, self.n_docs, per)]

    def read(self, part: _Range):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(part.start, part.end, dtype=np.int64)
        h = (ids * _HASH_MULT) % _HASH_MOD
        lang = np.array(LANGS, dtype=object)[h % 4]
        n_tokens = (10 + (h // 16) % 90).astype(np.int32)
        checksum = (ids * _CHK_MULT) % _CHK_MOD
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(lang, type=pa.string()),
             pa.array(n_tokens), pa.array(checksum)],
            names=["doc_id", "lang", "n_tokens", "checksum"])
