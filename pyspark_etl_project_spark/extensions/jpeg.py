"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 baseline
sequential DCT, Huffman entropy coding).

This container has no image libraries (PIL/libjpeg), so the JPEG leg
of `decode_media` was a documented NotImplementedError. Everything a
baseline decoder needs is in the public spec, and the math is numpy-
friendly, so the gap is closed for real here:

- decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS marker parse, generic
  canonical-Huffman decode of the entropy stream (byte unstuffing +
  RSTn restart handling), DC prediction, zigzag → dequantize → 2-D
  IDCT (matrix form), per-component nearest-neighbor upsampling for
  subsampled chroma, YCbCr→RGB (JFIF/BT.601 full-range). Sampling
  factors 1 and 2 (4:4:4, 4:2:2, 4:2:0) and grayscale are supported;
  progressive (SOF2) and arithmetic coding raise NotImplementedError.
- encoder: the minimal VALID baseline encoder the roundtrip tests
  need — 4:4:4 / grayscale, one fixed flat-length Huffman table pair
  (table efficiency is irrelevant for tests; validity is what the
  decoder consumes), caller-chosen uniform quantization. With quant=1
  the roundtrip is exact up to DCT rounding (±2 per channel), which
  is what the tests assert.

Decode runs inside the same Arrow-batched mapInPandas plumbing as the
PPM/BMP decoders (extensions/multimodal.py) — per-payload, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag order: index i of the scan -> (row, col) flat index in the 8x8.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Orthonormal 8-point DCT-II matrix: F = D @ f @ D.T, f = D.T @ F @ D.
_D = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


# --- canonical Huffman -------------------------------------------------------

def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """JPEG canonical Huffman: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over the entropy-coded segment, with 0xFF00
    unstuffing and RSTn restart-marker handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker()
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Consume the RSTn marker and realign to a byte boundary."""
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
                0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` magnitude bits to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- decoder -----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline-sequential JPEG to {"width", "height",
    "pixels"} with pixels a top-down RGB byte string (w*h*3) — the same
    contract as the PPM/BMP decoders. Grayscale replicates Y into RGB."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI without SOS scan")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(seg[o + 1: o + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 — baseline sequential
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF{marker - 0xC0})")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1: o + 17])
                nvals = sum(bits)
                vals = seg[o + 17: o + 17 + nvals]
                huff[(tc, th)] = _build_huffman(bits, vals)
                o += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(payload, pos + seglen, frame, qt, huff,
                                scan_tables, restart_interval)
        # APPn/COM/others: skip
        pos += seglen


def _decode_scan(payload, pos, frame, qt, huff, scan_tables,
                 restart_interval) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        cw, ch = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ch, cw), dtype=np.float64))
    reader = _BitReader(payload, pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff[(0, scan_tables[c["id"]][0])]
                ac_tbl = huff[(1, scan_tables[c["id"]][1])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(reader, dc_tbl, ac_tbl,
                                              qt[c["tq"]], dc_pred, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # Upsample to full resolution, crop, color-convert.
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0] + 128.0, 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = full[0] + 128.0, full[1], full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    return {"width": w, "height": h,
            "pixels": rgb.round().astype(np.uint8).tobytes()}


def _decode_block(reader, dc_tbl, ac_tbl, quant, dc_pred, ci) -> np.ndarray:
    coeffs = np.zeros(64, dtype=np.float64)
    size = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.read_bits(size), size) if size else 0
    dc_pred[ci] += diff
    coeffs[0] = dc_pred[ci]
    k = 1
    while k < 64:
        sym = reader.decode_symbol(ac_tbl)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(reader.read_bits(size), size)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = coeffs
    block = block.reshape(8, 8) * quant
    return _D.T @ block @ _D  # IDCT (level shift applied by caller)


# --- encoder (tests' synthetic-payload side) --------------------------------
# One fixed, VALID canonical-Huffman table pair covering every possible
# symbol at flat code lengths: DC symbols 0..11 at 4 bits, AC symbols
# 0..255 at 9 bits (255 codes) + 10 bits (1 code). Horribly inefficient
# and completely legal — the decoder consumes whatever DHT declares,
# which is the point: the roundtrip exercises the generic table path,
# not a special case.

_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_ENC_AC_VALS = bytes(range(256))


def _enc_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, length: int, value: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _edge_pad(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate `plane` up to (ph, pw) — padding that avoids
    ringing at the crop boundary."""
    h, w = plane.shape
    p = np.zeros((ph, pw))
    p[:h, :w] = plane
    p[h:, :w] = plane[h - 1:h, :]
    p[:h, w:] = p[:h, w - 1:w]
    p[h:, w:] = p[h - 1, w - 1]
    return p


def encode_jpeg_baseline(pixels: bytes, w: int, h: int,
                         quant: int = 1, grayscale: bool = False,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """Minimal valid baseline JPEG encoder: grayscale / 4:4:4 / 4:2:0
    (``subsample``, chroma as the 2x2 mean), one uniform quantization
    value, fixed flat Huffman tables, optional DRI/RSTn restart
    markers. quant=1 makes the decode roundtrip exact up to DCT
    rounding. Exists so the decoder's full surface — interleaved MCUs,
    chroma upsampling, restart resync — is testable without libjpeg."""
    arr = np.frombuffer(pixels, np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    if grayscale:
        comps = [(y, 1, 1)]
    else:
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            eh, ew = (h + 1) & ~1, (w + 1) & ~1
            cb2 = _edge_pad(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2) \
                .mean(axis=(1, 3))
            cr2 = _edge_pad(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2) \
                .mean(axis=(1, 3))
            comps = [(y, 2, 2), (cb2, 1, 1), (cr2, 1, 1)]
        else:
            comps = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
    qtbl = np.full((8, 8), quant, dtype=np.float64)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xFF\xD8")  # SOI
    zz = np.full(64, quant, dtype=np.uint8)
    out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x00" + zz.tobytes()
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_p, ch, cv) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (ch << 4) | cv, 0)
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc in (0, 1):
        bits = _ENC_DC_BITS if tc == 0 else _ENC_AC_BITS
        vals = _ENC_DC_VALS if tc == 0 else _ENC_AC_VALS
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    padded = [_edge_pad(p, mcus_y * cv * 8, mcus_x * ch * 8)
              for p, ch, cv in comps]
    bw = _BitWriter()
    dc_pred = [0] * nc
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out_rst = bytes([0xFF, 0xD0 + rst_n])
                bw.out += out_rst
                rst_n = (rst_n + 1) % 8
                dc_pred = [0] * nc
            for ci, (_p, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        _encode_block(bw, block, qtbl, dc_codes, ac_codes,
                                      dc_pred, ci)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _encode_block(bw, block, qtbl, dc_codes, ac_codes, dc_pred, ci) -> None:
    coef = np.rint((_D @ block @ _D.T) / qtbl).astype(np.int64)
    # zigzag_scan[i] = natural_flat[ZIGZAG[i]] — the inverse of the
    # decoder's block[ZIGZAG] = coeffs scatter.
    zzc = coef.reshape(64)[ZIGZAG]
    diff = int(zzc[0]) - dc_pred[ci]
    dc_pred[ci] = int(zzc[0])
    size = _category(diff)
    ln, code = dc_codes[size]
    bw.write(ln, code)
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        bw.write(size, amp)
    run = 0
    last_nz = max(np.nonzero(zzc)[0]) if np.any(zzc[1:]) else 0
    for k in range(1, 64):
        v = int(zzc[k])
        if k > last_nz:
            ln, code = ac_codes[0x00]  # EOB
            bw.write(ln, code)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            bw.write(ln, code)
            run -= 16
        size = _category(v)
        ln, code = ac_codes[(run << 4) | size]
        bw.write(ln, code)
        amp = v if v >= 0 else v + (1 << size) - 1
        bw.write(size, amp)
        run = 0
