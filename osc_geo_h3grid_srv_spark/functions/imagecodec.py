"""Pure-NumPy image codecs for the multimodal column family: Windows BMP
(BITMAPINFOHEADER, uncompressed BI_RGB, 24-bit color / 8-bit paletted or
grayscale) and Netpbm PPM/PGM (P5/P6 binary, maxval <= 255). Both are
fully public formats (the BMP layout is the classic Windows file format;
Netpbm headers are whitespace-separated ASCII) and need no external
libraries, which makes them the one end-to-end REAL decode path in this
container (VERDICT r02 next-step #6) — PIL/libvips codecs slot in behind
the same decode_image() dispatcher on a real cluster.

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
    never crash the job)."""
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    raise ImageDecodeError(
        f"unknown image container (magic {buf[:2]!r}); JPEG/PNG decode "
        "requires PIL/libvips — not available in this environment")
