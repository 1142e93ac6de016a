"""Pure-Python PNG codec (8-bit RGB truecolor) — the lossless
counterpart of extensions/jpeg.py, built only on stdlib zlib, so
`decode_media` handles real PNG files without PIL in the container.

Scope (the dominant training-corpus raster case): color type 2
(truecolor), bit depth 8, non-interlaced AND Adam7-interlaced (since
round 7: the seven-pass sub-image walk, each pass filtered
independently per the spec). All five scanline filters
(None/Sub/Up/Average/Paeth) are implemented — the encoder deliberately
CYCLES filters row by row so a decoder bug in any filter type shifts
pixel bytes and fails the oracle's channel sums. Alpha (color type 6),
palettes, and 16-bit depth raise with a precise message; they are
format variants, not codec gaps — the filter/inflate core below is
what they all share.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass geometry: (x0, y0, dx, dy) per pass, spec order.
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(ftype: int, line: bytearray, prev) -> bytearray:
    """Reverse one scanline filter in place (bpp=3). `prev` is the
    previous RECONSTRUCTED scanline of the same (sub-)image."""
    stride = len(line)
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
    return line


def _pass_dims(w: int, h: int, p: tuple[int, int, int, int]):
    x0, y0, dx, dy = p
    pw = (w - x0 + dx - 1) // dx if w > x0 else 0
    ph = (h - y0 + dy - 1) // dy if h > y0 else 0
    return pw, ph


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit truecolor PNG (interlace 0 or Adam7) to top-down
    RGB. Returns {"width", "height", "pixels"} like the PPM/BMP/JPEG
    decoders."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    w = h = None
    interlace = 0
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
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
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
    out = bytearray(h * stride)
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG data length {len(raw)} != expected {h * (stride + 1)}")
        prev = bytearray(stride)
        for row in range(h):
            base = row * (stride + 1)
            line = _unfilter_row(raw[base],
                                 bytearray(raw[base + 1:base + 1 + stride]),
                                 prev)
            out[row * stride:(row + 1) * stride] = line
            prev = line
    else:  # Adam7: seven independently-filtered sub-images, scattered
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw, ph = _pass_dims(w, h, (x0, y0, dx, dy))
            if pw == 0 or ph == 0:
                continue  # empty pass contributes NO bytes at all
            pstride = pw * 3
            prev = bytearray(pstride)
            for r in range(ph):
                ftype = raw[off]
                line = _unfilter_row(
                    ftype, bytearray(raw[off + 1:off + 1 + pstride]), prev)
                off += 1 + pstride
                y = y0 + r * dy
                for c in range(pw):
                    x = x0 + c * dx
                    out[(y * w + x) * 3:(y * w + x) * 3 + 3] = \
                        line[c * 3:c * 3 + 3]
                prev = line
        if off != len(raw):
            raise ValueError(
                f"PNG Adam7 data length {len(raw)} != consumed {off}")
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


def encode_png(pixels: bytes, w: int, h: int,
               interlace: bool = False) -> bytes:
    """Encode top-down RGB bytes as an 8-bit truecolor PNG. Filters
    cycle 0..4 by row (per sub-image in Adam7 mode) so a decode of this
    encoder's output exercises every unfilter path (tests + the
    oracle-gated query rely on that)."""
    stride = w * 3
    if len(pixels) != h * stride:
        raise ValueError(f"pixel buffer {len(pixels)} != {h}x{stride}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    raw = bytearray()
    if not interlace:
        prev = bytes(stride)
        for row in range(h):
            line = pixels[row * stride:(row + 1) * stride]
            ftype = row % 5
            raw.append(ftype)
            raw.extend(_filter_row(ftype, line, prev))
            prev = line
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw, ph = _pass_dims(w, h, (x0, y0, dx, dy))
            if pw == 0 or ph == 0:
                continue
            pstride = pw * 3
            prev = bytes(pstride)
            for r in range(ph):
                y = y0 + r * dy
                line = bytearray()
                for c in range(pw):
                    x = x0 + c * dx
                    line.extend(pixels[(y * w + x) * 3:(y * w + x) * 3 + 3])
                ftype = r % 5
                raw.append(ftype)
                raw.extend(_filter_row(ftype, bytes(line), prev))
                prev = bytes(line)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))
