"""Pure-Python PNG codec (8-bit RGB truecolor, non-interlaced) — the
lossless counterpart of extensions/jpeg.py, built only on stdlib zlib,
so `decode_media` handles real PNG files without PIL in the container.

Scope (the dominant training-corpus raster case): color type 2
(truecolor), bit depth 8, no interlace. All five scanline filters
(None/Sub/Up/Average/Paeth) are implemented — the encoder deliberately
CYCLES filters row by row so a decoder bug in any filter type shifts
pixel bytes and fails the oracle's channel sums. Alpha (color type 6),
palettes, 16-bit depth, and Adam7 raise with a precise message; they
are format variants, not codec gaps — the filter/inflate core below is
what they all share.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit truecolor non-interlaced PNG to top-down RGB.
    Returns {"width", "height", "pixels"} like the PPM/BMP/JPEG
    decoders."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        # CRC check keeps corrupt payloads loud instead of silently wrong.
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or color != 2:
                raise NotImplementedError(
                    f"only 8-bit truecolor supported (depth={depth}, "
                    f"color type={color})")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[row * stride:(row + 1) * stride] = line
        prev = line
    return {"width": w, "height": h, "pixels": bytes(out)}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _filter_row(ftype: int, line: bytes, prev: bytes) -> bytes:
    stride = len(line)
    out = bytearray(stride)
    for i in range(stride):
        x = line[i]
        left = line[i - 3] if i >= 3 else 0
        up = prev[i]
        ul = prev[i - 3] if i >= 3 else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - left) & 0xFF
        elif ftype == 2:
            out[i] = (x - up) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        else:
            out[i] = (x - _paeth(left, up, ul)) & 0xFF
    return bytes(out)


def encode_png(pixels: bytes, w: int, h: int) -> bytes:
    """Encode top-down RGB bytes as an 8-bit truecolor PNG. Filters
    cycle 0..4 by row so a decode of this encoder's output exercises
    every unfilter path (tests + the oracle-gated query rely on that)."""
    stride = w * 3
    if len(pixels) != h * stride:
        raise ValueError(f"pixel buffer {len(pixels)} != {h}x{stride}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for row in range(h):
        line = pixels[row * stride:(row + 1) * stride]
        ftype = row % 5
        raw.append(ftype)
        raw.extend(_filter_row(ftype, line, prev))
        prev = line
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))
