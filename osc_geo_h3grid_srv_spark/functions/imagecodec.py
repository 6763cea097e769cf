"""Pure-NumPy image codecs for the multimodal column family: Windows BMP
(BITMAPINFOHEADER, uncompressed BI_RGB, 24-bit color / 8-bit paletted or
grayscale), Netpbm PPM/PGM (P5/P6 binary, maxval <= 255), and PNG
(critical chunks, 8-bit gray/RGB/palette/alpha, filters 0-4, both
interlace methods incl. Adam7 — round 4; inflate is stdlib zlib). All
fully public formats needing no external libraries. Baseline JPEG lives
in the sibling functions/jpegcodec.py (round 4) and is routed through
the same decode_image() dispatcher by magic bytes.

All decoders return uint8 arrays shaped (H, W) for grayscale or
(H, W, 3) for RGB.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageDecodeError(ValueError):
    pass


# -- Netpbm (PPM P6 / PGM P5) ----------------------------------------------

def _pnm_header(buf: bytes):
    """parse magic + dims + maxval, tolerating comments/whitespace;
    returns (magic, width, height, maxval, pixel_offset)."""
    if len(buf) < 2:
        raise ImageDecodeError("pnm: truncated header")
    magic = buf[:2].decode("ascii", "replace")
    pos = 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageDecodeError("pnm: truncated header")
        try:
            fields.append(int(buf[start:pos]))
        except ValueError as e:
            raise ImageDecodeError(f"pnm: bad header token "
                                   f"{buf[start:pos]!r}") from e
    if pos >= len(buf) or not buf[pos:pos + 1].isspace():
        raise ImageDecodeError("pnm: missing pixel separator")
    pos += 1  # single whitespace byte before raster
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ImageDecodeError(f"pnm: bad dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ImageDecodeError(f"pnm: unsupported maxval {maxval}")
    return magic, w, h, maxval, pos


def decode_pnm(buf: bytes) -> np.ndarray:
    magic, w, h, _, off = _pnm_header(buf)
    if magic == "P5":
        need = w * h
        raw = np.frombuffer(buf, np.uint8, offset=off)
        if len(raw) < need:
            raise ImageDecodeError("pgm: truncated raster")
        return raw[:need].reshape(h, w).copy()
    if magic == "P6":
        need = w * h * 3
        raw = np.frombuffer(buf, np.uint8, offset=off)
        if len(raw) < need:
            raise ImageDecodeError("ppm: truncated raster")
        return raw[:need].reshape(h, w, 3).copy()
    raise ImageDecodeError(f"pnm: unsupported magic {magic!r}")


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError(f"encode_ppm: bad shape {img.shape}")


# -- BMP (BITMAPINFOHEADER, BI_RGB) ----------------------------------------

def decode_bmp(buf: bytes) -> np.ndarray:
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ImageDecodeError("bmp: not a BM file")
    data_off, = struct.unpack_from("<I", buf, 10)
    hdr_size, = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise ImageDecodeError(f"bmp: unsupported header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression, = struct.unpack_from("<I", buf, 30)
    if compression != 0:
        raise ImageDecodeError(f"bmp: compression {compression} "
                               "unsupported (BI_RGB only)")
    if bpp not in (8, 24):
        raise ImageDecodeError(f"bmp: bpp {bpp} unsupported")
    if w <= 0 or h == 0:
        raise ImageDecodeError(f"bmp: bad dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * h
    if len(buf) < need:
        raise ImageDecodeError("bmp: truncated pixel data")
    raw = np.frombuffer(buf, np.uint8, offset=data_off,
                        count=row_bytes * h).reshape(h, row_bytes)
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        n_colors, = struct.unpack_from("<I", buf, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        # malformed palettes must land in the quarantine column, not
        # escape as numpy ValueError/IndexError and kill the job
        if len(buf) < pal_off + n_colors * 4:
            raise ImageDecodeError("bmp: truncated palette")
        pal = np.frombuffer(buf, np.uint8, offset=pal_off,
                            count=n_colors * 4).reshape(-1, 4)
        idx = raw[:, :w]
        if pal.shape[0] and int(idx.max(initial=0)) >= pal.shape[0]:
            raise ImageDecodeError(
                f"bmp: palette index {int(idx.max())} >= "
                f"{pal.shape[0]} colors")
        is_gray = (pal.shape[0]
                   and (pal[:, 0] == pal[:, 1]).all()
                   and (pal[:, 1] == pal[:, 2]).all())
        if pal.shape[0] and not is_gray:
            # color palette: expand to RGB (palette entries are BGRA)
            return pal[idx][:, :, [2, 1, 0]].copy()
        return pal[idx, 0].copy() if pal.shape[0] else idx.copy()
    px = raw[:, :w * 3].reshape(h, w, 3)
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB writer (gray input is expanded)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_bmp: bad shape {img.shape}")
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    body = bytearray()
    for row in img[::-1]:
        body += row[:, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    head = (b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    return bytes(head + body)


# -- dispatcher -------------------------------------------------------------

def decode_image(buf: bytes) -> np.ndarray:
    """sniff the container by magic bytes; ImageDecodeError for unknown
    or malformed payloads (callers route those to quarantine columns,
    never crash the job).

    The except clause below is the crash-proofing chokepoint: a
    truncated segment header can surface as struct.error, a bad
    np.frombuffer length as ValueError, a corrupt zlib stream as
    zlib.error, a short slice-unpack as IndexError — all of which
    would escape the per-row `except ImageDecodeError` quarantine
    handlers and kill the whole batch. Normalize every parse-level
    exception here so one dirty crawled payload can never fail a job.
    """
    import struct as _struct
    import zlib as _zlib
    try:
        if buf[:2] == b"BM":
            return decode_bmp(buf)
        if buf[:2] in (b"P5", b"P6"):
            return decode_pnm(buf)
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(buf)
        if buf[:2] == b"\xFF\xD8":
            from .jpegcodec import decode_jpeg
            return decode_jpeg(buf)
        if buf[:6] in (b"GIF87a", b"GIF89a"):
            from .gifcodec import decode_gif
            return decode_gif(buf)
    except ImageDecodeError:
        raise
    except (_struct.error, _zlib.error, ValueError, IndexError,
            KeyError, OverflowError, MemoryError) as e:
        raise ImageDecodeError(
            f"malformed payload: {type(e).__name__}: {e}") from e
    raise ImageDecodeError(
        f"unknown image container (magic {buf[:2]!r})")


# -- PNG (public spec: RFC 2083 / W3C PNG) -----------------------------------
#
# Critical chunks only, bit depth 8, color types 0 (gray), 2 (RGB),
# 3 (palette), 4/6 (gray/RGB + alpha; alpha dropped — the stats
# pipeline consumes color planes). Both interlace methods: 0 (null)
# and 1 (Adam7, 7-pass de-interlace — round 4). Inflate is stdlib
# zlib (not an external lib).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """reverse the per-scanline filters; returns (h, w*ch) uint8."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ImageDecodeError("PNG: truncated scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:
            out[y] = row
        elif ft == 1:   # Sub: cumulative sum per channel lane mod 256
            lanes = row.reshape(w, ch).astype(np.uint64)
            out[y] = (np.cumsum(lanes, axis=0) % 256) \
                .astype(np.uint8).reshape(stride)
        elif ft == 2:   # Up
            out[y] = row + prev
        elif ft == 3:   # Average (left dependency -> per-byte loop)
            o = out[y]
            for x in range(stride):
                left = int(o[x - ch]) if x >= ch else 0
                o[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:   # Paeth
            o = out[y]
            for x in range(stride):
                a = int(o[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                o[x] = (int(row[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ImageDecodeError(f"PNG: unknown filter type {ft}")
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass, from the PNG spec
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _deinterlace_adam7(raw: bytes, w: int, h: int,
                       ch: int) -> np.ndarray:
    """Adam7 (round 4, VERDICT r3 Next #9): the inflated stream holds 7
    sequential sub-images, each filtered independently with its own
    scanline width; empty passes contribute zero bytes (not even filter
    bytes). Unfilter each pass with the shared scanline machinery, then
    scatter into the full-resolution grid."""
    out = np.zeros((h, w * ch), dtype=np.uint8).reshape(h, w, ch)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        need = ph * (pw * ch + 1)
        sub = _unfilter(raw[pos:pos + need], pw, ph, ch)
        pos += need
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
    return out.reshape(h, w * ch)


def decode_png(buf: bytes) -> np.ndarray:
    import zlib
    if buf[:8] != _PNG_MAGIC:
        raise ImageDecodeError("PNG: bad signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(buf):
        ln, typ = struct.unpack(">I4s", buf[pos:pos + 8])
        data = buf[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            raise ImageDecodeError("PNG: truncated chunk")
        pos += 12 + ln  # skip CRC (payload integrity is the codec
        #                 test's job here, not transport checksums)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ImageDecodeError("PNG: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ImageDecodeError(
            f"PNG: unsupported depth/compression ({depth},{comp},{filt})")
    if inter not in (0, 1):
        raise ImageDecodeError(f"PNG: unknown interlace method {inter}")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None:
        raise ImageDecodeError(f"PNG: unknown color type {ctype}")
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ImageDecodeError("PNG: unreasonable dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ImageDecodeError(f"PNG: bad zlib stream ({e})") from e
    px = (_deinterlace_adam7(raw, w, h, ch) if inter
          else _unfilter(raw, w, h, ch))
    if ctype == 0:
        return px.reshape(h, w)
    if ctype == 2:
        return px.reshape(h, w, 3)
    if ctype == 3:
        if plte is None:
            raise ImageDecodeError("PNG: palette image without PLTE")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ImageDecodeError("PNG: palette index out of range")
        return plte[idx]
    if ctype == 4:
        return px.reshape(h, w, 2)[:, :, 0]
    return px.reshape(h, w, 4)[:, :, :3]  # ctype 6: drop alpha


def encode_png(img: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """minimal encoder (the test's round-trip source): color type 0 or
    2, one filter type applied to every scanline (0/1/2/3/4 all
    supported so decode's unfilter paths are each exercisable), and
    optional Adam7 interlacing (each of the 7 sub-images filtered
    independently, per the spec)."""
    import zlib
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ch = 1 if gray else 3
    if interlace:
        img3 = img.reshape(h, w, ch)
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img3[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_rows(
                    sub.reshape(sub.shape[0], sub.shape[1] * ch),
                    ch, filter_type))
        idat_raw = b"".join(parts)
    else:
        idat_raw = _filter_rows(img.reshape(h, w * ch), ch, filter_type)
    def chunk(typ, data):
        import zlib as z
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", z.crc32(typ + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0,
                       1 if interlace else 0)
    idat = zlib.compress(idat_raw)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _filter_rows(flat: np.ndarray, ch: int, filter_type: int) -> bytes:
    """apply one PNG filter to every scanline of a (rows, stride)
    uint8 image; returns the filter-byte-prefixed scanline stream."""
    flat = flat.astype(np.int32)
    h, stride = flat.shape
    w_ch = stride  # stride = width * ch
    rows = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w_ch, np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = cur - (left + prev) // 2
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            enc = cur.copy()
            for x in range(w_ch):
                enc[x] = cur[x] - _paeth(int(left[x]), int(prev[x]),
                                         int(ul[x]))
        else:
            raise ValueError(f"filter_type {filter_type}")
        rows.append(bytes([filter_type]) + (enc % 256)
                    .astype(np.uint8).tobytes())
    return b"".join(rows)
