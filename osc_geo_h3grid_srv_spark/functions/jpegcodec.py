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
  replicate upsample, JFIF YCbCr -> RGB. Progressive (SOF2),
  arithmetic coding, 12-bit precision, and hierarchical modes raise
  JpegDecodeError -> the callers' quarantine column, never a crash.

* encoder — the test/fixture source: Annex K quantization tables
  scaled by the public IJG quality curve, Annex K typical Huffman
  tables, 4:4:4 or 4:2:0 subsampling, optional restart intervals.
  Grayscale input emits a 1-component scan.

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
    """baseline-sequential JFIF -> uint8 (H, W) gray or (H, W, 3) RGB."""
    if len(buf) < 4 or buf[0:2] != b"\xFF\xD8":
        raise JpegDecodeError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline-ish
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
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegDecodeError(
                f"jpeg: SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) unsupported — baseline sequential only")
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
            # entropy data follows until next non-RST/non-stuffed marker
            end = pos
            while end + 1 < len(buf):
                if buf[end] == 0xFF and buf[end + 1] != 0x00 \
                        and not (0xD0 <= buf[end + 1] <= 0xD7):
                    break
                end += 1
            scan = (sel, buf[pos:end])
            pos = end
            break  # single-scan baseline: decode now
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise JpegDecodeError("jpeg: missing SOF/SOS")
    return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                        restart_interval)


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
    # split at restart markers, unstuff each chunk
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
    # upsample to full-res, crop, color-convert
    full = []
    for (c, _, _, _), p in zip(order, planes):
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


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "4:2:0",
                restart_interval: int = 0) -> bytes:
    """baseline JFIF writer. img: uint8 (H, W) gray or (H, W, 3) RGB."""
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
    q_lum_zz = q_lum[ZIGZAG].astype(np.float64)
    q_chrom_zz = q_chrom[ZIGZAG].astype(np.float64)

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
