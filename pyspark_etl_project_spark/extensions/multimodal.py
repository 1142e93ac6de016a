"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas.

The image/audio decode libraries are not in this container, so the
decode step is STUBBED (NotImplementedError for real media;
deterministic fake features for testing). The Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is real and tested:
swapping the stub for PIL/ffmpeg is a local change inside the batch
iterator.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (spark.sql.execution.arrow.maxRecordsPerBatch bounds peak);
feature extraction is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload binary"
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, features array<double>"

FEATURE_META_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                       "content_md5 string, features array<double>")


def to_media_column(df: DataFrame, id_col: str, text_col: str,
                    media_type: str = "text/plain") -> DataFrame:
    """Pack a column as an opaque binary payload with typed metadata —
    the storage contract for image/audio/video blobs."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def decode_media(payload: bytes, media_type: str):
    """Decode a real media payload. STUB: the decode libraries (PIL,
    torchaudio, ffmpeg) are not installed in this environment."""
    if media_type.startswith("text/"):
        return payload.decode("utf-8", errors="replace")
    raise NotImplementedError(
        f"decode for {media_type!r} requires media libraries not present "
        "in this container; plug in PIL/ffmpeg here")


def extract_features(df: DataFrame, with_meta: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Features here are a deterministic fake (length + first/last byte)
    standing in for an image embedding; the mapInPandas batch shape,
    schema, and null handling are the real contract.

    ``with_meta=True`` carries the typed-metadata contract columns
    (media_type, content_md5) through the same single Arrow pass — no
    second scan or join needed downstream."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = payloads.map(
                lambda b: [float(len(b)),
                           float(b[0]) if len(b) else 0.0,
                           float(b[-1]) if len(b) else 0.0])
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "features": feats,
            }
            if with_meta:
                out["media_type"] = pdf["media_type"]
                out["content_md5"] = payloads.map(
                    lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(out)

    schema = FEATURE_META_SCHEMA if with_meta else FEATURE_SCHEMA
    return df.mapInPandas(batches, schema=schema)


RESIZE_SCHEMA = "doc_id long, orig_bytes long, resized_bytes long, resized_md5 string"


def resize_media(df: DataFrame, stride: int = 4) -> DataFrame:
    """Resize stand-in: downsample the payload by keeping every
    ``stride``-th byte (swap the body for PIL's Image.resize when the
    decode libs exist — the mapInPandas contract is identical: one
    payload in, one smaller payload out, metadata updated).

    The resized payload is fingerprinted via md5 over its uppercase hex
    so the byte selection is replayable in ANSI SQL. Map-side only; peak
    memory = one Arrow batch of payloads."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            resized = pdf["payload"].map(lambda b: b[::stride])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len).astype("int64"),
                "resized_bytes": resized.map(len).astype("int64"),
                "resized_md5": resized.map(
                    lambda b: hashlib.md5(b.hex().upper().encode()).hexdigest()),
            })

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def sample_frames(df: DataFrame, frame_bytes: int = 16,
                  every: int = 4) -> DataFrame:
    """Frame sampling over opaque media payloads: treat the payload as
    fixed-size frames (the deterministic stand-in for video decode —
    swap the chunker for an ffmpeg keyframe iterator in production) and
    keep every k-th frame, fingerprinted.

    One row in, many rows out — the mapInPandas batch iterator is the
    UDTF-shaped plumbing a real frame sampler needs. Frames hash via
    md5 over the uppercase hex of the chunk, byte-order exact and
    reproducible in ANSI SQL (md5(substring(hex(payload), ...))).

    Scale: embarrassingly parallel, no shuffle; output fan-out is
    n_bytes/(frame_bytes*every) rows per doc, bounded by the Arrow batch
    size one input batch at a time.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                nf = len(payload) // frame_bytes
                for i in range(0, nf, every):
                    chunk = payload[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(did)
                    idxs.append(i)
                    hashes.append(hashlib.md5(
                        chunk.hex().upper().encode()).hexdigest())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_md5": pd.Series(hashes, dtype="object")})

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
