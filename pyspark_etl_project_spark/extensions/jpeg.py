"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 baseline
sequential DCT, Huffman entropy coding).

This container has no image libraries (PIL/libjpeg), so the JPEG leg
of `decode_media` was a documented NotImplementedError. Everything a
baseline decoder needs is in the public spec, and the math is numpy-
friendly, so the gap is closed for real here:

- decoder: SOI/APPn/DQT/SOF0/SOF2/DHT/DRI/SOS marker parse, generic
  canonical-Huffman decode of the entropy stream (byte unstuffing +
  RSTn restart handling), DC prediction, zigzag → dequantize → 2-D
  IDCT (matrix form), per-component nearest-neighbor upsampling for
  subsampled chroma, YCbCr→RGB (JFIF/BT.601 full-range). Sampling
  factors 1 and 2 (4:4:4, 4:2:2, 4:2:0) and grayscale are supported.
  PROGRESSIVE (SOF2, Huffman) decodes fully since round 7: spectral
  selection + successive approximation per T.81 Annex G (DC
  first/refine, AC first with EOBRUN, AC refinement with correction
  bits). Arithmetic coding and the non-DCT SOF types still raise
  NotImplementedError.
- encoder: the minimal VALID baseline encoder the roundtrip tests
  need — 4:4:4 / grayscale, one fixed flat-length Huffman table pair
  (table efficiency is irrelevant for tests; validity is what the
  decoder consumes), caller-chosen uniform quantization. With quant=1
  the roundtrip is exact up to DCT rounding (±2 per channel), which
  is what the tests assert. `encode_jpeg_progressive` emits a 5-stage
  progressive scan script over the same coefficients, so its decode
  is bit-identical to decoding the baseline encoding.

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
    coefs = None  # progressive: per-component zigzag coefficient arrays
    pos = 2
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if frame is not None and frame.get("progressive") and \
                    coefs is not None:
                return _reconstruct_progressive(frame, qt, coefs)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline/progressive DCT JPEG supported "
                f"(SOF{marker - 0xC0})")
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
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
                scan_comps.append(cs)
            if not frame.get("progressive"):
                return _decode_scan(payload, pos + seglen, frame, qt, huff,
                                    scan_tables, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_progressive_scan(
                payload, pos + seglen, frame, huff, scan_tables,
                scan_comps, ss, se, ah_al >> 4, ah_al & 0x0F, coefs,
                restart_interval)
            continue
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
    return _finish_planes(planes, comps, w, h, hmax, vmax)


def _finish_planes(planes, comps, w, h, hmax, vmax) -> dict:
    """Shared decode tail (baseline + progressive): upsample each
    component plane to full resolution, crop, YCbCr->RGB."""
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


# --- progressive (SOF2) decode ----------------------------------------------
# T.81 Annex G, Huffman path: spectral selection + successive
# approximation. Coefficients accumulate across scans in per-component
# zigzag-order arrays; DC uses floor-shift point transform, AC uses
# sign-magnitude truncation toward zero — the distinction every
# refinement bit depends on. Structure mirrors the spec's figures
# G.2/G.7 (the same control flow libjpeg's phuff codecs implement).

def _frame_geometry(frame):
    comps = frame["comps"]
    # Same precise guard as the baseline scan path (_decode_scan):
    # T.81 allows factors up to 4, but only {1,2} is implemented, and
    # the progressive reconstruct would otherwise fail deep inside
    # numpy (mismatched plane shapes) or silently mis-upsample.
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return comps, hmax, vmax, mcus_x, mcus_y


def _comp_block_grid(frame, ci):
    """Real (non-MCU-padded) block grid of one component — the block
    count a NON-interleaved scan covers (T.81 A.2.2)."""
    comps, hmax, vmax, _, _ = _frame_geometry(frame)
    c = comps[ci]
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coefs(frame):
    comps, _hmax, _vmax, mcus_x, mcus_y = _frame_geometry(frame)
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                     dtype=np.int32) for c in comps]


def _dec_ac_first(reader, ac_tbl, zz, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_symbol(ac_tbl)
        r, s = sym >> 4, sym & 15
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
    return 0


def _dec_ac_refine(reader, ac_tbl, zz, ss, se, al, eobrun):
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode_symbol(ac_tbl)
            r, s = sym >> 4, sym & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("refinement symbol size must be 1")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit() and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(payload, pos, frame, huff, scan_tables,
                             scan_comps, ss, se, ah, al, coefs,
                             restart_interval):
    comps, _hmax, _vmax, mcus_x, mcus_y = _frame_geometry(frame)
    idx_of = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(payload, pos)
    dc_pred = [0] * len(comps)
    eobrun = 0
    unit = 0  # MCU (interleaved) or block (non-interleaved) counter

    def maybe_restart():
        nonlocal dc_pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.restart()
            dc_pred = [0] * len(comps)
            eobrun = 0

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        if len(scan_comps) > 1:  # interleaved, MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for cid in scan_comps:
                        ci = idx_of[cid]
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                zz = coefs[ci][my * c["v"] + by,
                                               mx * c["h"] + bx]
                                if ah == 0:
                                    tbl = huff[(0, scan_tables[cid][0])]
                                    size = reader.decode_symbol(tbl)
                                    diff = _extend(reader.read_bits(size),
                                                   size) if size else 0
                                    dc_pred[ci] += diff
                                    zz[0] = dc_pred[ci] << al
                                elif reader.read_bit():
                                    zz[0] = int(zz[0]) | (1 << al)
                    unit += 1
        else:
            ci = idx_of[scan_comps[0]]
            bh, bw = _comp_block_grid(frame, ci)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    zz = coefs[ci][by, bx]
                    if ah == 0:
                        tbl = huff[(0, scan_tables[scan_comps[0]][0])]
                        size = reader.decode_symbol(tbl)
                        diff = _extend(reader.read_bits(size),
                                       size) if size else 0
                        dc_pred[ci] += diff
                        zz[0] = dc_pred[ci] << al
                    elif reader.read_bit():
                        zz[0] = int(zz[0]) | (1 << al)
                    unit += 1
    else:  # AC scan: always non-interleaved (one component)
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid = scan_comps[0]
        ci = idx_of[cid]
        ac_tbl = huff[(1, scan_tables[cid][1])]
        bh, bw = _comp_block_grid(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                zz = coefs[ci][by, bx]
                if ah == 0:
                    eobrun = _dec_ac_first(reader, ac_tbl, zz, ss, se,
                                           al, eobrun)
                else:
                    eobrun = _dec_ac_refine(reader, ac_tbl, zz, ss, se,
                                            al, eobrun)
                unit += 1

    # Realign to the next marker (skipping pad bits / stuffed bytes).
    p = reader.pos
    while not (payload[p] == 0xFF and payload[p + 1] != 0x00
               and not (0xD0 <= payload[p + 1] <= 0xD7)):
        p += 1
    return p


def _reconstruct_progressive(frame, qt, coefs):
    comps, hmax, vmax, _mx, _my = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        zz = coefs[ci].astype(np.float64)
        bh, bw = zz.shape[0], zz.shape[1]
        natural = np.zeros_like(zz)
        natural[..., ZIGZAG] = zz
        blocks = natural.reshape(bh, bw, 8, 8) * qt[c["tq"]]
        spatial = np.einsum("ij,abjk,kl->abil", _D.T, blocks, _D)
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _finish_planes(planes, comps, frame["w"], frame["h"], hmax, vmax)


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


# --- progressive (SOF2) encoder ---------------------------------------------
# Spectral selection + one successive-approximation level (Al=1 first
# pass, Al=0 refinement) for both DC and AC — the scan script below
# exercises every progressive decode path: DC first/refine, AC first
# with accumulated EOBRUNs and ZRL, AC refinement with buffered
# correction bits and newly-nonzero insertion. Same fixed flat Huffman
# tables and uniform quantization as the baseline encoder; 4:4:4 and
# grayscale (progressive chroma subsampling would only change the DC
# scan's MCU geometry, not the entropy coding being tested).

def _comp_zigzag_coefs(plane, qtbl, bh, bw):
    padded = _edge_pad(plane, bh * 8, bw * 8)
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _D, blocks, _D.T)
    q = np.rint(coef / qtbl).astype(np.int64)
    return q.reshape(bh, bw, 64)[..., ZIGZAG]


def _emit_eobrun(bw, ac_codes, eobrun, pending_bits):
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        ln, code = ac_codes[nbits << 4]
        bw.write(ln, code)
        if nbits:
            bw.write(nbits, eobrun - (1 << nbits))
        for b in pending_bits:
            bw.write(1, b)
    return 0, []


def _enc_ac_first_scan(bw, ac_codes, blocks, ss, se, al):
    eobrun = 0
    for zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            a = abs(v) >> al
            vals.append(a if v >= 0 else -a)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _emit_eobrun(bw, ac_codes, eobrun, [])
            continue
        eobrun, _ = _emit_eobrun(bw, ac_codes, eobrun, [])
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.write(ln, code)
                run -= 16
            size = _category(v)
            ln, code = ac_codes[(run << 4) | size]
            bw.write(ln, code)
            amp = v if v >= 0 else v + (1 << size) - 1
            bw.write(size, amp)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _emit_eobrun(bw, ac_codes, eobrun, [])
    _emit_eobrun(bw, ac_codes, eobrun, [])


def _enc_ac_refine_scan(bw, ac_codes, blocks, ss, se, al):
    eobrun = 0
    pending: list[int] = []  # correction bits owed to the open EOBRUN
    for zz in blocks:
        absv = []
        last_one = -1
        for i, k in enumerate(range(ss, se + 1)):
            a = abs(int(zz[k])) >> al
            absv.append(a)
            if a == 1:
                last_one = i
        run = 0
        br: list[int] = []  # correction bits in the current run
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= last_one:
                eobrun, pending = _emit_eobrun(bw, ac_codes, eobrun,
                                               pending)
                ln, code = ac_codes[0xF0]
                bw.write(ln, code)
                run -= 16
                for b in br:
                    bw.write(1, b)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            eobrun, pending = _emit_eobrun(bw, ac_codes, eobrun, pending)
            ln, code = ac_codes[(run << 4) | 1]
            bw.write(ln, code)
            bw.write(1, 0 if int(zz[ss + i]) < 0 else 1)
            for b in br:
                bw.write(1, b)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 900:
                eobrun, pending = _emit_eobrun(bw, ac_codes, eobrun,
                                               pending)
    _emit_eobrun(bw, ac_codes, eobrun, pending)


def encode_jpeg_progressive(pixels: bytes, w: int, h: int,
                            quant: int = 1,
                            grayscale: bool = False) -> bytes:
    """Valid progressive (SOF2) JPEG: DC first (Al=1) + DC refine, per-
    component AC first scans for bands 1-5 and 6-63 (Al=1), then a
    full-band AC refinement (Al=0). With quant=1 the decoded output is
    BIT-IDENTICAL to decoding the baseline encoding of the same pixels
    (progressive transmission is lossless given equal coefficients)."""
    arr = np.frombuffer(pixels, np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    if grayscale:
        planes = [y]
    else:
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    nc = len(planes)
    qtbl = np.full((8, 8), quant, dtype=np.float64)
    bh, bw_blocks = -(-h // 8), -(-w // 8)
    coefs = [_comp_zigzag_coefs(p, qtbl, bh, bw_blocks) for p in planes]

    out = bytearray(b"\xFF\xD8")
    zzq = np.full(64, quant, dtype=np.uint8)
    out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x00" + zzq.tobytes()
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    out += b"\xFF\xC2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc in (0, 1):
        bits = _ENC_DC_BITS if tc == 0 else _ENC_AC_BITS
        vals = _ENC_DC_VALS if tc == 0 else _ENC_AC_VALS
        seg = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + struct.pack(">H", 2 + len(seg)) + seg

    all_ids = list(range(1, nc + 1))
    blocks_of = [[coefs[ci][by, bx] for by in range(bh)
                  for bx in range(bw_blocks)] for ci in range(nc)]

    # scan 1: DC first, interleaved, Al=1 (floor-shift point transform)
    out += sos_header(all_ids, 0, 0, 0, 1)
    bw = _BitWriter()
    dc_pred = [0] * nc
    for by in range(bh):
        for bx in range(bw_blocks):
            for ci in range(nc):
                v = int(coefs[ci][by, bx, 0]) >> 1
                diff = v - dc_pred[ci]
                dc_pred[ci] = v
                size = _category(diff)
                ln, code = dc_codes[size]
                bw.write(ln, code)
                if size:
                    amp = diff if diff >= 0 else diff + (1 << size) - 1
                    bw.write(size, amp)
    bw.flush()
    out += bw.out
    # scan 2: DC refinement, Ah=1 -> Al=0 (one raw bit per block)
    out += sos_header(all_ids, 0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(bh):
        for bx in range(bw_blocks):
            for ci in range(nc):
                bw.write(1, int(coefs[ci][by, bx, 0]) & 1)
    bw.flush()
    out += bw.out
    # scans 3-4: AC first per component, two spectral bands, Al=1
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            _enc_ac_first_scan(bw, ac_codes, blocks_of[ci], ss, se, 1)
            bw.flush()
            out += bw.out
    # scan 5: AC refinement per component, full band, Al=0
    for ci in range(nc):
        out += sos_header([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        _enc_ac_refine_scan(bw, ac_codes, blocks_of[ci], 1, 63, 0)
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
