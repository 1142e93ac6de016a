"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas.

Every modality has a REAL end-to-end decoder: PPM P6 and 24-bit BMP
below (header parse, row padding, BGR/bottom-up handling),
baseline-sequential JPEG via the numpy codec in extensions/jpeg.py
(Huffman entropy decode, dequantize + IDCT, 4:2:0 chroma upsampling,
restart-marker resync), 8-bit truecolor PNG via extensions/png.py
(zlib inflate + all five unfilters), PCM16 WAV audio and YUV4MPEG2
video below. Only compressed video containers (mp4/webm) raise
NotImplementedError — their demux/codec belongs to ffmpeg, and the
swap-in point is the same ``decode_media`` dispatch. The Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is
identical either way.

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
    """Decode a media payload.

    Real pure-Python decoders: PPM P6 and 24-bit uncompressed BMP
    (below), baseline-sequential JPEG (extensions/jpeg.py — full T.81
    baseline: Huffman, IDCT, 4:2:0/4:2:2 upsampling, restart markers),
    8-bit truecolor PNG (extensions/png.py — stdlib zlib inflate + all
    five scanline unfilters), PCM16 WAV audio (_decode_wav below —
    real RIFF chunk walk), and YUV4MPEG2 video (_decode_y4m below —
    header tags, FRAME walk, C420/C444 planes). Rasters return
    {"width", "height", "pixels"} with ``pixels`` a top-down RGB byte
    string (w*h*3); audio returns {"sample_rate", "n_channels",
    "samples"}; video returns {"width", "height", "n_frames",
    "frames"}. Compressed video containers (mp4/webm) remain
    NotImplementedError — demux/codec belongs to ffmpeg; plug it into
    this dispatch. Progressive JPEG, palette/alpha/interlaced PNG,
    non-PCM16 WAV, and exotic chroma raise with precise messages."""
    if media_type.startswith("text/"):
        return payload.decode("utf-8", errors="replace")
    if media_type in ("image/x-portable-pixmap", "image/ppm"):
        return _decode_ppm(payload)
    if media_type == "image/bmp":
        return _decode_bmp(payload)
    if media_type in ("image/jpeg", "image/jpg"):
        from pyspark_etl_project_spark.extensions.jpeg import decode_jpeg
        return decode_jpeg(payload)
    if media_type == "image/png":
        from pyspark_etl_project_spark.extensions.png import decode_png
        return decode_png(payload)
    if media_type in ("audio/wav", "audio/x-wav"):
        return _decode_wav(payload)
    if media_type in ("video/yuv4mpeg", "video/x-yuv4mpeg"):
        return _decode_y4m(payload)
    raise NotImplementedError(
        f"decode for {media_type!r} requires media libraries not present "
        "in this container; plug in PIL/ffmpeg here")


def _decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6): 'P6' <ws> width <ws> height <ws> maxval '\\n'
    then raw RGB rows top-down. Comments (#...) allowed in the header."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * 3
    pixels = payload[pos:pos + need]
    if len(pixels) != need:
        raise ValueError(f"truncated PPM: want {need} bytes, have {len(pixels)}")
    return {"width": w, "height": h, "pixels": bytes(pixels)}


def _decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed (BI_RGB) BMP: rows are 4-byte padded, stored
    bottom-up in BGR — returned normalized to top-down RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = (h - 1 - row) if bottom_up else row
        base = data_off + src_row * row_stride
        for x in range(w):
            b, g, r = payload[base + 3 * x: base + 3 * x + 3]
            o = (row * w + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
    return {"width": w, "height": h, "pixels": bytes(out)}


def encode_bmp(pixels: bytes, w: int, h: int) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (top-down RGB in, standard
    bottom-up BGR + row padding out) — the synthetic-payload side of the
    decode roundtrip tests."""
    import struct

    row_stride = (w * 3 + 3) & ~3
    img = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            o = (row * w + x) * 3
            r, g, b = pixels[o:o + 3]
            line += bytes((b, g, r))
        line += b"\x00" * (row_stride - w * 3)
        img += line
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                      2835, 2835, 0, 0)
    return bytes(header + dib + img)


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


# --- real decode: synthetic raster -> parser -> exact channel stats --------

IMAGE_STATS_SCHEMA = ("doc_id long, width int, height int, n_pixels long, "
                      "sum_r long, sum_g long, sum_b long")


def _synth_pixels(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic pixel bytes: the md5 digest of str(doc_id), repeated
    to w*h*3 bytes. Byte-replayable in ANSI SQL (byte i of the stream =
    hex pair (i % 16) of md5(CAST(doc_id AS VARCHAR))), which is what
    makes the decode path oracle-checkable without shipping binaries to
    DuckDB."""
    import hashlib

    digest = hashlib.md5(str(doc_id).encode()).digest()
    need = w * h * 3
    return (digest * (need // 16 + 1))[:need]


def synth_images(df: DataFrame, id_col: str, fmt: str = "ppm") -> DataFrame:
    """Generate a MEDIA_SCHEMA frame of real raster payloads (PPM P6,
    24-bit BMP, PNG, or baseline JPEG) with deterministic dimensions
    (w = 4 + id % 5,
    h = 3 + id % 4) and md5-derived pixels. Stand-in for reading an
    image corpus: the payloads are genuine files the decoders must
    actually parse (header, padding, channel order)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, mts, sizes, payloads = [], [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                px = _synth_pixels(did, w, h)
                if fmt == "ppm":
                    payload = b"P6\n%d %d\n255\n" % (w, h) + px
                    mt = "image/x-portable-pixmap"
                elif fmt == "bmp":
                    payload = encode_bmp(px, w, h)
                    mt = "image/bmp"
                elif fmt == "png":
                    # Lossless: the full md5-repeated pixel pattern
                    # roundtrips exactly, and the row-cycled filters
                    # (png.py:encode_png) force the decoder through
                    # every unfilter path.
                    from pyspark_etl_project_spark.extensions.png import (
                        encode_png)
                    payload = encode_png(px, w, h)
                    mt = "image/png"
                elif fmt == "jpeg":
                    # Solid md5-derived color: the one pixel pattern the
                    # lossy codec roundtrips EXACTLY (DC-only blocks at
                    # quant=1 — asserted by tests/test_jpeg.py), so the
                    # channel sums stay oracle-replayable. Subsampling +
                    # restart markers exercise the decoder's full path.
                    from pyspark_etl_project_spark.extensions.jpeg import (
                        encode_jpeg_baseline)
                    solid = px[:3] * (w * h)
                    payload = encode_jpeg_baseline(solid, w, h, quant=1,
                                                   subsample=True,
                                                   restart_interval=2)
                    mt = "image/jpeg"
                else:
                    raise ValueError(f"unknown synthetic format {fmt!r}")
                ids.append(did)
                mts.append(mt)
                sizes.append(len(payload))
                payloads.append(payload)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "media_type": pd.Series(mts, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return df.select(F.col(id_col)).mapInPandas(batches, schema=MEDIA_SCHEMA)


def image_stats(df: DataFrame) -> DataFrame:
    """Decode every payload with the real pure-Python parsers
    (``decode_media`` dispatch on media_type) and emit exact per-channel
    byte sums — integers, so the result is bit-portable across engines.
    A header misparse, padding slip, or BGR/RGB mixup changes the sums,
    which is what the oracle twin checks. Map-side only, one Arrow
    batch of payloads in memory at a time."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["payload"]):
                img = decode_media(bytes(payload), mt)
                px = img["pixels"]
                rows.append((int(did), img["width"], img["height"],
                             img["width"] * img["height"],
                             sum(px[0::3]), sum(px[1::3]), sum(px[2::3])))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "n_pixels", "sum_r", "sum_g",
                                              "sum_b"])

    return df.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


GRAY_STATS_SCHEMA = ("doc_id long, n_pixels long, sum_luma long, "
                     "min_luma int, max_luma int")


def grayscale_stats(df: DataFrame) -> DataFrame:
    """Decode and convert to 8-bit grayscale with the integer ITU
    BT.601 luma, y = (299*r + 587*g + 114*b) div 1000 — pure integer
    arithmetic, so per-image luma sums and extrema replay exactly in
    the SQL oracle (a float luma would drift in the last ulp). The
    transform half of the image path: decode feeds a per-pixel map,
    still one Arrow batch at a time, nothing leaves the executor."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["payload"]):
                img = decode_media(bytes(payload), mt)
                px = img["pixels"]
                lum = [(299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2])
                       // 1000 for i in range(0, len(px), 3)]
                rows.append((int(did), len(lum), sum(lum),
                             min(lum) if lum else 0,
                             max(lum) if lum else 0))
            yield pd.DataFrame(rows, columns=["doc_id", "n_pixels",
                                              "sum_luma", "min_luma",
                                              "max_luma"])

    return df.mapInPandas(batches, schema=GRAY_STATS_SCHEMA)


# --- audio: PCM16 WAV (pure stdlib, real RIFF parsing) ----------------------

AUDIO_STATS_SCHEMA = ("doc_id long, n_frames long, n_channels int, "
                      "sample_rate int, sum_ch0 long, sum_ch1 long")


def _decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM16 decoder: walks the chunk list (fmt before data,
    ancillary chunks skipped — real encoders emit LIST/fact/cue chunks,
    so a fixed-44-byte-header assumption breaks on real files), checks
    PCM format 1 at 16 bits, and returns interleaved signed samples.
    {"sample_rate", "n_channels", "samples"} — samples a list[int]."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (format={audio_fmt}, bits={bits})")
            fmt = (ch, rate)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            n = len(body) // 2
            samples = list(struct.unpack(f"<{n}h", body[:2 * n]))
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return {"sample_rate": fmt[1], "n_channels": fmt[0], "samples": samples}


def encode_wav(samples: list[int], n_channels: int, rate: int) -> bytes:
    """Minimal PCM16 WAV encoder (interleaved samples in)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate,
                      rate * n_channels * 2, n_channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _synth_samples(doc_id: int, n_values: int) -> list[int]:
    """Deterministic int16 samples from md5(str(doc_id)) byte pairs —
    value i = b(2i) + 256*b(2i+1), two's-complement signed. Same
    hex-pair replay contract as _synth_pixels, so the decode path is
    oracle-checkable in ANSI SQL."""
    import hashlib

    digest = hashlib.md5(str(doc_id).encode()).digest()
    out = []
    for i in range(n_values):
        v = digest[(2 * i) % 16] + 256 * digest[(2 * i + 1) % 16]
        out.append(v - 65536 if v >= 32768 else v)
    return out


def synth_audio(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA frame of real PCM16 WAV payloads: n_frames =
    40 + id % 17, channels = 1 + id % 2, rate = 8000 * (1 + id % 2),
    md5-derived samples. Genuine RIFF files the decoder must actually
    parse (chunk walk, alignment, sign handling)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, mts, sizes, payloads = [], [], [], []
            for did in pdf[id_col]:
                did = int(did)
                frames, ch = 40 + did % 17, 1 + did % 2
                rate = 8000 * (1 + did % 2)
                payload = encode_wav(_synth_samples(did, frames * ch),
                                     ch, rate)
                ids.append(did)
                mts.append("audio/wav")
                sizes.append(len(payload))
                payloads.append(payload)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "media_type": pd.Series(mts, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return df.select(F.col(id_col)).mapInPandas(batches, schema=MEDIA_SCHEMA)


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode WAV payloads with the real RIFF parser and emit exact
    per-channel sample sums (integers — bit-portable, same contract as
    image_stats). Map-side only."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["payload"]):
                wav = decode_media(bytes(payload), mt)
                s = wav["samples"]
                ch = wav["n_channels"]
                rows.append((int(did), len(s) // ch, ch,
                             wav["sample_rate"],
                             sum(s[0::ch]),
                             sum(s[1::ch]) if ch > 1 else 0))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames",
                                              "n_channels", "sample_rate",
                                              "sum_ch0", "sum_ch1"])

    return df.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


MIXDOWN_SCHEMA = ("doc_id long, n_frames long, n_channels int, "
                  "sum_mono long, min_mono int, max_mono int")


def audio_mixdown_stats(df: DataFrame) -> DataFrame:
    """Stereo→mono mixdown over the real WAV decode path: per frame
    mono = trunc((ch0 + ch1) / 2) — truncation toward zero chosen
    EXPLICITLY because the engines disagree on negative integer
    division (DuckDB's // truncates, Python's // floors); trunc is the
    one semantics both can state exactly. Mono-input docs pass
    through (ch1 = ch0). Emits per-doc mono sample sum and extrema —
    integers, oracle-replayable down to the sign convention."""
    import pandas as pd

    def trunc2(t: int) -> int:
        return abs(t) // 2 * (1 if t >= 0 else -1)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["payload"]):
                a = decode_media(bytes(payload), mt)
                ch = a["n_channels"]
                sm = a["samples"]  # interleaved
                c0 = sm[0::ch]
                c1 = sm[1::ch] if ch > 1 else c0
                mono = [trunc2(x + y) for x, y in zip(c0, c1)]
                rows.append((int(did), len(mono), ch, sum(mono),
                             min(mono) if mono else 0,
                             max(mono) if mono else 0))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames",
                                              "n_channels", "sum_mono",
                                              "min_mono", "max_mono"])

    return df.mapInPandas(batches, schema=MIXDOWN_SCHEMA)


# --- video: YUV4MPEG2 (Y4M), pure stdlib -----------------------------------
# The uncompressed interchange format the ffmpeg/x264 toolchain pipes
# between stages — a real public video container with a text header and
# raw YUV planes, so the decode path is genuinely parseable without
# codec libraries. Compressed containers (mp4/webm) still route to the
# NotImplementedError dispatch arm; their demux/codec belongs to ffmpeg.

VIDEO_STATS_SCHEMA = ("doc_id long, n_frames long, width int, height int, "
                      "sum_y long, sum_u long, sum_v long")


def _decode_y4m(payload: bytes) -> dict:
    """YUV4MPEG2 decoder (C420 and C444 chroma): parses the stream
    header (W/H/F/C tags), walks FRAME headers (parameters after FRAME
    are legal and skipped), and returns per-frame y/u/v planes.
    {"width", "height", "n_frames", "frames": [(y, u, v), ...]}."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    chroma = "420"
    for tag in payload[9:nl].split():
        t = tag.decode("ascii", errors="replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            chroma = t[1:]
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if chroma.startswith("420"):
        cw, chh = w // 2, h // 2
    elif chroma.startswith("444"):
        cw, chh = w, h
    else:
        raise NotImplementedError(f"chroma subsampling C{chroma} "
                                  "not supported (only 420/444)")
    ysz, csz = w * h, cw * chh
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME header at byte {pos}")
        pos = fnl + 1
        if pos + ysz + 2 * csz > len(payload):
            raise ValueError("truncated Y4M frame")
        y = payload[pos:pos + ysz]
        u = payload[pos + ysz:pos + ysz + csz]
        v = payload[pos + ysz + csz:pos + ysz + 2 * csz]
        frames.append((y, u, v))
        pos += ysz + 2 * csz
    return {"width": w, "height": h, "n_frames": len(frames),
            "frames": frames}


def encode_y4m(frames: list[tuple[bytes, bytes, bytes]], w: int, h: int,
               chroma: str = "420") -> bytes:
    """Minimal Y4M encoder (C420/C444, 25:1 fps, progressive)."""
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode())
    for y, u, v in frames:
        out += b"FRAME\n" + y + u + v
    return bytes(out)


def synth_videos(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA frame of real Y4M payloads: even dims
    w = 4 + 2*(id % 3), h = 4 + 2*(id % 2), n_frames = 2 + id % 3,
    C420, planes filled from the md5(str(id)) byte stream in plane
    order (the same hex-pair replay contract as images/audio)."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, mts, sizes, payloads = [], [], [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + 2 * (did % 3), 4 + 2 * (did % 2)
                nf = 2 + did % 3
                ysz, csz = w * h, (w // 2) * (h // 2)
                digest = hashlib.md5(str(did).encode()).digest()
                need = nf * (ysz + 2 * csz)
                stream = (digest * (need // 16 + 1))[:need]
                frames = []
                off = 0
                for _ in range(nf):
                    frames.append((stream[off:off + ysz],
                                   stream[off + ysz:off + ysz + csz],
                                   stream[off + ysz + csz:
                                          off + ysz + 2 * csz]))
                    off += ysz + 2 * csz
                payload = encode_y4m(frames, w, h)
                ids.append(did)
                mts.append("video/yuv4mpeg")
                sizes.append(len(payload))
                payloads.append(payload)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "media_type": pd.Series(mts, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return df.select(F.col(id_col)).mapInPandas(batches, schema=MEDIA_SCHEMA)


def video_stats(df: DataFrame) -> DataFrame:
    """Decode Y4M payloads with the real parser and emit exact per-plane
    byte sums across frames (the image_stats/audio_stats contract)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["payload"]):
                vid = decode_media(bytes(payload), mt)
                sy = sum(sum(f[0]) for f in vid["frames"])
                su = sum(sum(f[1]) for f in vid["frames"])
                sv = sum(sum(f[2]) for f in vid["frames"])
                rows.append((int(did), vid["n_frames"], vid["width"],
                             vid["height"], sy, su, sv))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "width",
                                              "height", "sum_y", "sum_u",
                                              "sum_v"])

    return df.mapInPandas(batches, schema=VIDEO_STATS_SCHEMA)
