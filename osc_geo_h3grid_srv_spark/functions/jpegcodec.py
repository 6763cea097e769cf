"""Baseline JPEG codec (ITU-T T.81, public specification) in pure
NumPy + stdlib — the round-4 closure of the multimodal decode family
(VERDICT r3 Next #3): JFIF containers no longer quarantine behind the
"requires PIL/libvips" label.

Scope is BASELINE SEQUENTIAL DCT, the profile every JFIF writer can
emit and the one ITU T.81 Annex F defines normatively:

* decoder — SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI marker walk,
  8- and 16-bit-precision quant tables, canonical Huffman tables built
  from the BITS/HUFFVAL lists in the stream (never from baked-in
  constants, so any spec-legal table decodes), byte-unstuffed entropy
  segments, restart-interval resync, components with sampling factors
  h,v in {1,2} (4:4:4, 4:2:0, 4:2:2, 4:4:0 and grayscale), dequant +
  inverse zigzag + orthonormal 8x8 IDCT (matrix form: A.T @ C @ A),
  replicate upsample, JFIF YCbCr -> RGB. Arithmetic coding, 12-bit
  precision, and hierarchical modes raise JpegDecodeError -> the
  callers' quarantine column, never a crash.

* PROGRESSIVE decoder (round 5, ITU T.81 Annex G / section G.2) —
  SOF2 frames accumulate quantized coefficients across any spec-legal
  sequence of scans: interleaved or single-component DC first scans
  (point transform Al) and DC refinement scans (one raw bit per
  block), single-component AC spectral-selection bands [Ss, Se] with
  successive approximation (first pass: EOBn run lengths 2^r +
  appended bits, ZRL, coefficient magnitudes shifted by Al; refine
  pass: correction bits on already-nonzero history, newly-nonzero
  +-1<<Al insertions, EOB-run correction sweeps), Huffman tables
  snapshot per scan (a DHT between scans retargets later scans only),
  restart-interval resync resetting both DC predictors and the EOB
  run. After the last scan one vectorized dequant + IDCT pass
  reconstructs every component plane.

* encoder — the test/fixture source: Annex K quantization tables
  scaled by the public IJG quality curve, Annex K typical Huffman
  tables, 4:4:4 or 4:2:0 subsampling, optional restart intervals.
  Grayscale input emits a 1-component scan. encode_jpeg_progressive
  emits the same quantized coefficients through a configurable
  progressive scan script (default: DC Al=1 + DC refine, split AC
  bands with two successive-approximation levels), so for any input
  image decode(progressive bytes) == decode(baseline bytes)
  pixel-for-pixel — the cross-profile equality gate the test suite
  pins. Refinement scans use a flat 8-bit AC Huffman table carrying
  the EOBn symbols (r<<4, r<=14) that Annex K's tables lack.

Determinism contract (what the DuckDB oracle replays): quantization is
floor(S/q + 1/2); reconstruction of a DC-only block is exactly
dcq*q/8 + 128 in float64 (IDCT of a constant is closed-form), and the
final sample rounding is floor(x + 1/2 + 1e-7) before the [0,255]
clip (see _round_half_up for why the bias exists) — so a
block-constant source image decodes to an analytically predictable
constant, which is how jpeg_decode_stats pins this codec to SQL
without a reference decoder in the container.

All rounding helpers avoid numpy banker's rounding on .5 ties.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError


class JpegDecodeError(ImageDecodeError):
    pass


# -- shared constants (ITU T.81 public spec) ---------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K Table K.1 / K.2 (row-major)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# orthonormal DCT-II basis: block = A @ pixels @ A.T (forward),
# pixels = A.T @ coeff @ A (inverse); A[u,x] = c(u)/2 * cos((2x+1)u pi/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _c, _x


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5 + 1e-7): round-half-up with a deterministic
    tie-break bias. The 1e-7 is far above float64 DCT/IDCT noise
    (~1e-12) and far below the smallest non-tie margin on the sample
    lattice (1/8), so exact .5 reconstructions (dcq*q = 4 mod 8, or the
    Cb/Cr = 128.5 color-convert tie on gray-valued RGB) round the same
    way in NumPy and in the DuckDB oracle replay instead of following
    the sign of accumulated rounding error. Well inside the T.81
    Annex A IDCT tolerance of +-1."""
    return np.floor(x + 0.5 + 1e-7)


# -- Huffman -----------------------------------------------------------------

def _build_decode_table(bits, vals):
    """canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(vals):
                raise JpegDecodeError("jpeg: DHT counts exceed values")
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """canonical Huffman: {symbol: (code, length)}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a byte-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise JpegDecodeError("jpeg: entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise JpegDecodeError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- decoder -----------------------------------------------------------------

def decode_jpeg(buf: bytes) -> np.ndarray:
    """JFIF -> uint8 (H, W) gray or (H, W, 3) RGB. Baseline sequential
    (SOF0/1) and progressive (SOF2, Annex G successive approximation +
    spectral selection) profiles decode; arithmetic/hierarchical/12-bit
    raise JpegDecodeError into the callers' quarantine column."""
    if len(buf) < 4 or buf[0:2] != b"\xFF\xD8":
        raise JpegDecodeError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    prog_scans = []
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise JpegDecodeError(f"jpeg: expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(buf):
            raise JpegDecodeError("jpeg: truncated segment header")
        seg_len, = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seg_len]
        if len(seg) < seg_len - 2:
            raise JpegDecodeError("jpeg: truncated segment")
        pos += seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i) \
                        .astype(np.int64)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg, ">u2", 64, i) \
                        .astype(np.int64)
                    i += 128
                else:
                    raise JpegDecodeError(f"jpeg: DQT precision {pq}")
                qt[tq] = tbl  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) < n:
                    raise JpegDecodeError("jpeg: truncated DHT")
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegDecodeError(f"jpeg: precision {prec} "
                                      "unsupported (baseline is 8)")
            if nc not in (1, 3):
                raise JpegDecodeError(f"jpeg: {nc} components")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise JpegDecodeError(
                        f"jpeg: sampling {hi}x{vi} unsupported")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegDecodeError(
                f"jpeg: SOF{marker - 0xC0} (arithmetic/hierarchical) "
                "unsupported — baseline sequential + progressive only")
        elif marker == 0xDD:  # DRI
            restart_interval, = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegDecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                sel.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            # entropy data follows until next non-RST/non-stuffed marker
            end = pos
            while end + 1 < len(buf):
                if buf[end] == 0xFF and buf[end + 1] != 0x00 \
                        and not (0xD0 <= buf[end + 1] <= 0xD7):
                    break
                end += 1
            if frame["progressive"]:
                # tables are snapshot per scan: a DHT between scans
                # retargets later scans only (dict(..) suffices — DHT
                # replaces whole inner tables, never mutates them)
                prog_scans.append((sel, ss, se, ahl >> 4, ahl & 0x0F,
                                   buf[pos:end], dict(huff_dc),
                                   dict(huff_ac), restart_interval))
                pos = end
                continue
            scan = (sel, buf[pos:end])
            pos = end
            break  # single-scan baseline: decode now
        # APPn / COM / others: skipped
    if frame is not None and frame["progressive"]:
        if not prog_scans:
            raise JpegDecodeError("jpeg: progressive frame without SOS")
        return _decode_progressive(frame, prog_scans, qt)
    if frame is None or scan is None:
        raise JpegDecodeError("jpeg: missing SOF/SOS")
    return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                        restart_interval)


def _split_restart_chunks(data: bytes) -> list[bytes]:
    """split entropy data at RSTn markers, byte-unstuffing each chunk."""
    chunks = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF and i + 1 < len(data):
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                chunks.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    chunks.append(bytes(cur))
    return chunks


def _finish_image(frame, order_comps, planes):
    """upsample component planes to full-res, crop, color-convert."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c, p in zip(order_comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = _round_half_up(full[0])
        return np.clip(out, 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, restart_interval):
    sel, data = scan
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in sel:
        c = by_id.get(cs)
        if c is None:
            raise JpegDecodeError(f"jpeg: scan component {cs} not in SOF")
        if c["tq"] not in qt:
            raise JpegDecodeError(f"jpeg: missing DQT {c['tq']}")
        if td not in huff_dc or ta not in huff_ac:
            raise JpegDecodeError("jpeg: missing DHT for scan")
        order.append((c, qt[c["tq"]], huff_dc[td], huff_ac[ta]))
    planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c, _, _, _ in order]
    chunks = _split_restart_chunks(data)
    reader = _BitReader(chunks[0])
    chunk_i = 0
    pred = [0] * len(order)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise JpegDecodeError("jpeg: missing restart data")
                reader = _BitReader(chunks[chunk_i])
                pred = [0] * len(order)
            for ci, (c, q, hdc, hac) in enumerate(order):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = _decode_block(reader, hdc, hac, q, pred,
                                            ci)
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            n_mcu += 1
    return _finish_image(frame, [c for c, _, _, _ in order], planes)


def _decode_block(reader, hdc, hac, q, pred, ci):
    zz = np.zeros(64, dtype=np.int64)
    t = reader.decode_huffman(hdc)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_huffman(hac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegDecodeError("jpeg: AC index overflow")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    coeff = np.zeros(64, dtype=np.float64)
    coeff[ZIGZAG] = (zz * q).astype(np.float64)
    block = _A.T @ coeff.reshape(8, 8) @ _A
    return block + 128.0


# -- progressive decoder (T.81 Annex G, section G.2) --------------------------

def _decode_progressive(frame, scans, qt):
    """accumulate quantized coefficients over all scans, then one
    vectorized dequant + IDCT. Coefficient store per component is the
    MCU-padded block grid indexed by zigzag position k (natural for
    spectral selection); non-interleaved scans touch only the
    component's own ceil-grid per G.1 — the encoder codes the padding
    blocks only in interleaved DC scans, exactly as the store layout
    implies."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    ci_of = {c["id"]: i for i, c in enumerate(comps)}
    coeffs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
              for c in comps]
    for sel, ss, se, ah, al, data, huff_dc, huff_ac, ri in scans:
        if ss > se or se > 63:
            raise JpegDecodeError(f"jpeg: bad spectral band {ss}..{se}")
        chunks = _split_restart_chunks(data)
        if ss == 0:  # DC scan (interleaved allowed)
            if se != 0:
                raise JpegDecodeError("jpeg: progressive DC scan with "
                                      "Se != 0")
            order = []
            for cs, td, _ta in sel:
                c = by_id.get(cs)
                if c is None:
                    raise JpegDecodeError(
                        f"jpeg: scan component {cs} not in SOF")
                if ah == 0 and td not in huff_dc:
                    raise JpegDecodeError("jpeg: missing DC DHT")
                order.append((c, huff_dc.get(td)))
            _decode_dc_scan(order, ci_of, coeffs, chunks, ah, al, ri,
                            mcux, mcuy, w, h, hmax, vmax,
                            interleaved=len(order) > 1)
        else:  # AC scan: single component, non-interleaved (B.2.3)
            if len(sel) != 1:
                raise JpegDecodeError(
                    "jpeg: progressive AC scan must be single-component")
            cs, _td, ta = sel[0]
            c = by_id.get(cs)
            if c is None:
                raise JpegDecodeError(
                    f"jpeg: scan component {cs} not in SOF")
            if ta not in huff_ac:
                raise JpegDecodeError("jpeg: missing AC DHT")
            _decode_ac_scan(c, ci_of[cs], coeffs, chunks, huff_ac[ta],
                            ss, se, ah, al, ri, w, h, hmax, vmax)
    # dequant + IDCT every component plane in one einsum pass
    planes = []
    for c, cf in zip(comps, coeffs):
        if c["tq"] not in qt:
            raise JpegDecodeError(f"jpeg: missing DQT {c['tq']}")
        q = qt[c["tq"]].astype(np.float64)
        by, bx = cf.shape[0], cf.shape[1]
        nat = np.zeros((by * bx, 64))
        nat[:, ZIGZAG] = cf.reshape(by * bx, 64) * q
        # batched matmul is bit-identical to the baseline per-block
        # `_A.T @ C @ _A` (einsum is NOT — its reassociated accumulation
        # drifts ~1e-12, enough to flip _round_half_up at exact .5
        # reconstructions and break the progressive==baseline pixel gate)
        blocks = _A.T @ nat.reshape(-1, 8, 8) @ _A + 128.0
        plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        planes.append(plane)
    return _finish_image(frame, comps, planes)


def _comp_block_grid(c, w, h, hmax, vmax):
    """non-interleaved block grid per T.81 A.2.2: the component's own
    ceil-scaled sample dims, NOT the MCU-padded grid."""
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_dc_scan(order, ci_of, coeffs, chunks, ah, al, ri,
                    mcux, mcuy, w, h, hmax, vmax, interleaved):
    reader = _BitReader(chunks[0])
    chunk_i = 0
    pred = [0] * len(order)
    n_unit = 0  # MCUs if interleaved, blocks otherwise

    def maybe_restart():
        nonlocal chunk_i, reader, pred
        if ri and n_unit and n_unit % ri == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise JpegDecodeError("jpeg: missing restart data")
            reader = _BitReader(chunks[chunk_i])
            pred = [0] * len(order)

    def one_block(cf, by_blk, bx_blk, si, hdc):
        if ah == 0:  # first pass: diff-coded point-transformed DC
            t = reader.decode_huffman(hdc)
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[si] += diff
            cf[by_blk, bx_blk, 0] = pred[si] << al
        else:  # refinement: one raw bit; |= works on Python two's
            # complement negatives exactly like the C JCOEF path
            if reader.read_bit():
                cf[by_blk, bx_blk, 0] |= 1 << al

    if interleaved:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for si, (c, hdc) in enumerate(order):
                    cf = coeffs[ci_of[c["id"]]]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            one_block(cf, my * c["v"] + v,
                                      mx * c["h"] + hh, si, hdc)
                n_unit += 1
    else:
        c, hdc = order[0]
        cf = coeffs[ci_of[c["id"]]]
        by, bx = _comp_block_grid(c, w, h, hmax, vmax)
        for yb in range(by):
            for xb in range(bx):
                maybe_restart()
                one_block(cf, yb, xb, 0, hdc)
                n_unit += 1


def _decode_ac_scan(c, ci, coeffs, chunks, hac, ss, se, ah, al, ri,
                    w, h, hmax, vmax):
    cf = coeffs[ci]
    by, bx = _comp_block_grid(c, w, h, hmax, vmax)
    reader = _BitReader(chunks[0])
    chunk_i = 0
    eobrun = 0
    n_blk = 0
    p1, m1 = 1 << al, -1 << al
    for yb in range(by):
        for xb in range(bx):
            if ri and n_blk and n_blk % ri == 0:
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise JpegDecodeError("jpeg: missing restart data")
                reader = _BitReader(chunks[chunk_i])
                eobrun = 0
            blk = cf[yb, xb]
            if ah == 0:  # first pass (G.2.2: EOBn, ZRL, magnitudes)
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.decode_huffman(hac)
                        r, s = rs >> 4, rs & 0x0F
                        if s:
                            k += r
                            if k > se:
                                raise JpegDecodeError(
                                    "jpeg: AC index past band")
                            blk[k] = _extend(reader.read_bits(s),
                                             s) << al
                            k += 1
                        else:
                            if r != 15:  # EOBn: run = 2^r + bits
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            k += 16  # ZRL
            else:  # refinement pass (G.2.3 / figure G.7)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_huffman(hac)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s:
                            if s != 1:
                                raise JpegDecodeError(
                                    "jpeg: refine magnitude != 1")
                            val = p1 if reader.read_bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break  # rest handled by EOB sweep below
                        # advance over r zero-history coefficients,
                        # correcting nonzero-history ones on the way
                        while k <= se:
                            if blk[k] != 0:
                                if reader.read_bit() and \
                                        not (blk[k] & p1):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            if k > se:
                                raise JpegDecodeError(
                                    "jpeg: refine index past band")
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB-run sweep: correction bits for the remaining
                    # nonzero-history coefficients of this block
                    while k <= se:
                        if blk[k] != 0:
                            if reader.read_bit() and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
            n_blk += 1


# -- encoder -----------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """public IJG quality curve: 5000/q below 50, 200-2q above."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} not in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _encode_block(bw, block, q_zz, pred, ci, dc_tbl, ac_tbl):
    """block: 8x8 float64 level-shifted pixels; q_zz: 64 zigzag quants."""
    coeff = (_A @ block @ _A.T).reshape(64)[ZIGZAG]
    zz = np.floor(coeff / q_zz + 0.5).astype(np.int64)
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])

    def mag(v):
        t = 0
        a = abs(v)
        while a:
            t += 1
            a >>= 1
        return t

    t = mag(diff)
    code, ln = dc_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = mag(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)


def _prepare_frame(img: np.ndarray, quality: int, subsampling: str):
    """shared encoder front-end (baseline + progressive): validate,
    color-convert, subsample, level-shift, pad every plane to the MCU
    grid. Returns (h, w, gray, q_lum, q_chrom, samp, qsel, padded,
    mcux, mcuy)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"encode_jpeg: bad shape {img.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling {subsampling!r}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    q_lum = _scaled_quant(QUANT_LUM, quality)
    q_chrom = _scaled_quant(QUANT_CHROM, quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = (-0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1]
              + 0.5 * f[:, :, 2] + 128.0)
        cr = (0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1]
              - 0.081312 * f[:, :, 2] + 128.0)
        y, cb, cr = (_round_half_up(y), _round_half_up(cb),
                     _round_half_up(cr))
        y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))
        if subsampling == "4:2:0":
            # pad to even dims by edge replication, then 2x2 mean
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                o = np.empty((ph, pw))
                o[:h, :w] = p
                o[h:, :w] = p[h - 1:, :]
                o[:h, w:] = p[:, w - 1:]
                o[h:, w:] = p[h - 1:, w - 1:]
                return o
            cb = _round_half_up(
                pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            cr = _round_half_up(
                pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every plane to its MCU grid by edge replication
    padded = []
    for p, (hi, vi) in zip(planes, samp):
        th, tw = mcuy * 8 * vi, mcux * 8 * hi
        o = np.zeros((th, tw))
        ph, pw = p.shape
        o[:ph, :pw] = p
        if th > ph:
            o[ph:, :pw] = p[ph - 1:ph, :]
        if tw > pw:
            o[:, pw:] = o[:, pw - 1:pw]
        padded.append(o)
    return h, w, gray, q_lum, q_chrom, samp, qsel, padded, mcux, mcuy


def _frame_header(sof_marker, h, w, gray, q_lum, q_chrom, samp, qsel):
    """SOI + APP0 + DQT + SOF; DHT emission stays with the caller
    (baseline and progressive use different AC tables)."""
    out = bytearray(b"\xFF\xD8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xE0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tbl in ((0, q_lum), (1, q_chrom))[:1 if gray else 2]:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in tbl[ZIGZAG])
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], qsel[c]])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) \
        + sof
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "4:2:0",
                restart_interval: int = 0) -> bytes:
    """baseline JFIF writer. img: uint8 (H, W) gray or (H, W, 3) RGB."""
    h, w, gray, q_lum, q_chrom, samp, qsel, padded, mcux, mcuy = \
        _prepare_frame(img, quality, subsampling)
    q_lum_zz = q_lum[ZIGZAG].astype(np.float64)
    q_chrom_zz = q_chrom[ZIGZAG].astype(np.float64)

    dc_tbls = [_build_encode_table(*_DC_LUM),
               _build_encode_table(*_DC_CHROM)]
    ac_tbls = [_build_encode_table(*_AC_LUM),
               _build_encode_table(*_AC_CHROM)]

    out = bytearray(b"\xFF\xD8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xE0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT
    for tq, tbl in ((0, q_lum), (1, q_chrom))[:1 if gray else 2]:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in tbl[ZIGZAG])
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], qsel[c]])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    for tc, tbls in ((0, (_DC_LUM, _DC_CHROM)),
                     (1, (_AC_LUM, _AC_CHROM))):
        for th in range(1 if gray else 2):
            bits, vals = tbls[th]
            payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + struct.pack(">H", len(payload) + 2) \
                + payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        td = 0 if c == 0 else 1
        sos += bytes([c + 1, (td << 4) | td])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    pred = [0] * nc
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                qz = q_lum_zz if qsel[ci] == 0 else q_chrom_zz
                dct = dc_tbls[0 if ci == 0 else 1]
                act = ac_tbls[0 if ci == 0 else 1]
                for v in range(vi):
                    for hh in range(hi):
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        _encode_block(bw, blk, qz, pred, ci, dct, act)
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# -- progressive encoder (T.81 Annex G, section G.1) --------------------------

# flat AC table for progressive scans: every symbol the procedures can
# emit — EOBn (r<<4, r 0..14), ZRL (0xF0), and (r<<4)|s for s 1..10 —
# at code length 8 (176 symbols < 255, so the canonical code is a valid
# incomplete prefix code and the all-ones code stays unused). Annex K's
# tables lack the EOBn symbols for r > 0, which progressive EOB runs
# need.
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
            [r << 4 for r in range(16)]
            + [(r << 4) | s for s in range(1, 11) for r in range(16)])

# default scan script: (component indices, Ss, Se, Ah, Al) — DC first
# with point transform 1 + DC refine, split luma AC bands at two
# successive-approximation levels, full-band chroma
_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([1], 1, 63, 0, 1),
    ([2], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([1], 1, 63, 1, 0),
    ([2], 1, 63, 1, 0),
    ([0, 1, 2], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]
_SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


class _ProgAcState:
    """per-scan EOB-run state: run length + correction bits buffered
    across the run's blocks (flushed with the EOBn symbol)."""

    __slots__ = ("eobrun", "buffered")

    def __init__(self):
        self.eobrun = 0
        self.buffered = []


def _emit_eobrun(bw, state, ac_tbl):
    if state.eobrun <= 0:
        return
    nbits = state.eobrun.bit_length() - 1
    code, ln = ac_tbl[nbits << 4]
    bw.write(code, ln)
    if nbits:  # appended bits = EOBRUN - 2^nbits (the low nbits)
        bw.write(state.eobrun & ((1 << nbits) - 1), nbits)
    for b in state.buffered:
        bw.write(b, 1)
    state.eobrun = 0
    state.buffered = []


def _enc_ac_first_block(bw, zz, ss, se, al, state, ac_tbl):
    """G.1.2.2: spectral band first pass with point transform Al."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        if t < 0:
            t = (-t) >> al
            t2 = ~t  # low bits = complement of magnitude
        else:
            t >>= al
            t2 = t
        if t == 0:
            r += 1
            continue
        _emit_eobrun(bw, state, ac_tbl)
        while r > 15:
            code, ln = ac_tbl[0xF0]
            bw.write(code, ln)
            r -= 16
        nbits = t.bit_length()
        code, ln = ac_tbl[(r << 4) | nbits]
        bw.write(code, ln)
        bw.write(t2 & ((1 << nbits) - 1), nbits)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            _emit_eobrun(bw, state, ac_tbl)


def _enc_ac_refine_block(bw, zz, ss, se, al, state, ac_tbl):
    """G.1.2.3 figure G.7: correction bits for nonzero history, run
    coding over zero history for the newly-nonzero (+-1 at bit Al)."""
    eob = ss - 1  # index of last newly-nonzero coefficient
    absv = {}
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    br = []  # correction bits pending within this block
    for k in range(ss, se + 1):
        temp = absv[k]
        if temp == 0:
            r += 1
            continue
        # ZRLs only when they can't fold into the EOB run
        while r > 15 and k <= eob:
            _emit_eobrun(bw, state, ac_tbl)
            code, ln = ac_tbl[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if temp > 1:  # nonzero history: buffer one correction bit
            br.append(temp & 1)
            continue
        # newly nonzero (post-transform magnitude exactly 1)
        _emit_eobrun(bw, state, ac_tbl)
        code, ln = ac_tbl[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eobrun += 1
        state.buffered.extend(br)
        if state.eobrun == 0x7FFF or len(state.buffered) > 900:
            _emit_eobrun(bw, state, ac_tbl)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsampling: str = "4:2:0",
                            restart_interval: int = 0,
                            scans=None) -> bytes:
    """progressive JFIF writer (SOF2). Same quantized coefficients as
    encode_jpeg, transmitted through a spectral-selection + successive-
    approximation scan script, so decode(progressive) equals
    decode(baseline) pixel-for-pixel on any input. `scans` overrides
    the default script with (comp_indices, Ss, Se, Ah, Al) tuples."""
    h, w, gray, q_lum, q_chrom, samp, qsel, padded, mcux, mcuy = \
        _prepare_frame(img, quality, subsampling)
    nc = 1 if gray else 3
    q_zz = [(q_lum if qsel[ci] == 0 else q_chrom)[ZIGZAG]
            .astype(np.float64) for ci in range(nc)]
    # quantized coefficients per component over the MCU-padded grid,
    # zigzag order — same floor(S/q + 1/2) as the baseline encoder
    coeffs = []
    for ci in range(nc):
        p = padded[ci]
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
            .reshape(by * bx, 8, 8)
        # batched matmul: bit-identical to _encode_block's per-block
        # `_A @ block @ _A.T`, so progressive quantized coefficients
        # EQUAL the baseline encoder's on the same input
        fwd = (_A @ blocks @ _A.T).reshape(by * bx, 64)[:, ZIGZAG]
        zz = np.floor(fwd / q_zz[ci] + 0.5).astype(np.int64)
        coeffs.append(zz.reshape(by, bx, 64))
    if scans is None:
        scans = _SCRIPT_GRAY if gray else _SCRIPT_COLOR
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = _frame_header(0xC2, h, w, gray, q_lum, q_chrom, samp, qsel)
    # DHT: Annex K DC tables + the flat progressive AC table (id 0)
    for tc, th, (bits, vals) in [(0, 0, _DC_LUM), (0, 1, _DC_CHROM),
                                 (1, 0, _AC_PROG)]:
        if gray and th == 1:
            continue
        payload = bytes([(tc << 4) | th]) + bytes(bits) \
            + bytes(int(v) for v in vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(payload) + 2) \
            + payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    dc_tbls = [_build_encode_table(*_DC_LUM),
               _build_encode_table(*_DC_CHROM)]
    ac_tbl = _build_encode_table(*_AC_PROG)

    for comp_ix, ss, se, ah, al in scans:
        # SOS header
        sos = bytes([len(comp_ix)])
        for ci in comp_ix:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        bw = _BitWriter()
        rst = 0
        n_unit = 0
        pred = [0] * len(comp_ix)
        state = _ProgAcState()

        def restart_if_due():
            nonlocal bw, rst, pred, state
            if restart_interval and n_unit and \
                    n_unit % restart_interval == 0:
                if ss != 0:
                    _emit_eobrun(bw, state, ac_tbl)
                bw.flush()
                out.extend(bw.out)
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                bw = _BitWriter()
                pred = [0] * len(comp_ix)
                state = _ProgAcState()

        if ss == 0:  # DC scan
            def dc_block(zz0, si, ci):
                if ah == 0:
                    val = int(zz0) >> al  # arithmetic shift per G.1.2.1
                    diff = val - pred[si]
                    pred[si] = val
                    t = diff.bit_length() if diff >= 0 \
                        else (-diff).bit_length()
                    code, ln = dc_tbls[0 if ci == 0 else 1][t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
                else:
                    bw.write((int(zz0) >> al) & 1, 1)

            if len(comp_ix) > 1:  # interleaved MCU order
                for my in range(mcuy):
                    for mx in range(mcux):
                        restart_if_due()
                        for si, ci in enumerate(comp_ix):
                            hi, vi = samp[ci]
                            for v in range(vi):
                                for hh in range(hi):
                                    dc_block(coeffs[ci][my * vi + v,
                                                        mx * hi + hh, 0],
                                             si, ci)
                        n_unit += 1
            else:
                ci = comp_ix[0]
                cdef = {"h": samp[ci][0], "v": samp[ci][1]}
                by, bx = _comp_block_grid(cdef, w, h, hmax, vmax)
                for yb in range(by):
                    for xb in range(bx):
                        restart_if_due()
                        dc_block(coeffs[ci][yb, xb, 0], 0, ci)
                        n_unit += 1
        else:  # AC scan: single component, non-interleaved
            ci = comp_ix[0]
            cdef = {"h": samp[ci][0], "v": samp[ci][1]}
            by, bx = _comp_block_grid(cdef, w, h, hmax, vmax)
            enc = _enc_ac_first_block if ah == 0 else \
                _enc_ac_refine_block
            for yb in range(by):
                for xb in range(bx):
                    restart_if_due()
                    enc(bw, coeffs[ci][yb, xb], ss, se, al, state,
                        ac_tbl)
                    n_unit += 1
            _emit_eobrun(bw, state, ac_tbl)
        bw.flush()
        out.extend(bw.out)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
