"""Thin Hadoop FileSystem access for layout-aware operators.

The mart/index maintenance code probes and prunes directory layouts
(bucket dirs, partition dirs, marker files) before Spark ever plans a
scan. Going through the Hadoop FS API — not os.path — keeps every probe
working on HDFS/S3/ABFS exactly as on local paths. This module is the
single home for the py4j incantation so the four former copy-paste
sites (_check_mart_layout, scd2_merge_batch, foreach_batch_scd2,
band_index_batch) cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """Return (jvm, fs, jpath) for ``path``: the py4j JVM gateway, the
    Hadoop FileSystem owning the path's scheme, and the path as a
    Hadoop Path object."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, jpath


# Hadoop glob metacharacters (GlobPattern): alternation, classes,
# wildcards, and the backslash that escapes them.
_GLOB_CHARS = "*?[]{}\\"


def escape_glob(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a LITERAL path so
    it can be embedded in a globStatus pattern (or handed to a Spark
    path that glob-expands). Without this, a base path containing
    { } [ ] * ? mis-matches — e.g. read_mart_touched's bucket glob
    would silently fall back to the full listing it exists to avoid,
    or match a different directory outright."""
    return "".join("\\" + c if c in _GLOB_CHARS else c for c in path)


def glob_dirs(spark: SparkSession, pattern: str) -> list[str]:
    """Paths matching a Hadoop glob pattern (empty list when nothing
    matches — globStatus returns null then, which this wraps away)."""
    _, fs, jpattern = hadoop_fs(spark, pattern)
    statuses = fs.globStatus(jpattern)
    return ([str(s.getPath()) for s in statuses]
            if statuses is not None else [])


def write_text_marker(spark: SparkSession, path: str, content: str) -> None:
    """Create-or-replace a tiny marker file (e.g. fingerprint
    provenance)."""
    _, fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text_marker(spark: SparkSession, path: str) -> str | None:
    """Read a marker file written by write_text_marker; None when the
    file does not exist (legacy layouts predating the marker). Bulk
    copy through IOUtils — a per-byte stream.read() loop would cost one
    py4j round trip per byte."""
    jvm, fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    # closeAll=True closes both ends for us.
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")
