"""PySpark-native analytics engine re-expressing the capabilities of
venkatcg00/Pyspark-ETL-Project (multi-source customer-support ETL with
SCD2 history, hash-CDC, dimension lookups, normalization and data-quality
scoring) as idiomatic distributed Spark, plus large-scale training-data
pipeline extensions (dedup, similarity search, text analysis, multimodal).

Design notes (100 TB scale):
- DataFrame/SQL API only; Catalyst handles pushdown, pruning, join choice.
- No Python row-UDFs on the reference-parity path (the reference's per-row
  SQLite lookup UDFs become broadcast hash joins).
- Mart partitioned by SOURCE_ID; SCD2 merge rewrites only touched
  partitions; dims are broadcast.
- Extensions use built-in column expressions first, Arrow-batched Pandas
  UDFs only where semantics require Python.
"""

__version__ = "0.1.0"
