"""Pure-Python/NumPy GIF codec (public spec: CompuServe GIF87a/GIF89a,
also W3C's republication). Completes the web image family next to
JPEG/PNG/BMP/Netpbm: GIF is the third of the three containers that
dominate crawled web media, and its LZW entropy coding is the one
compression scheme the other codecs don't exercise.

Decoder: header + logical screen descriptor, global and local color
tables, extension-block walking (graphic control / comment / plain
text / application — all length-prefixed sub-block chains), the full
variable-code-width LZW decompressor (clear + end-of-information
codes, code width growth to the 12-bit cap, deferred-clear tolerant),
and the 4-pass row interlace. Frame 0 is rendered onto the logical
screen (background color fill when the frame rect is smaller);
`frame=k` seeks by walking sub-block LENGTHS only — skipped frames
are never decompressed (the same O(1)-per-skip discipline as the Y4M
codec) — and returns that frame's own rect standalone (animation
compositing/disposal is out of scope; stats pipelines consume stills).
GIF89a transparency is ignored the same way the PNG decoder drops
alpha: the stats pipeline consumes color planes.

Encoder: single full-screen frame, power-of-two palette, a REAL LZW
compressor (dictionary growth, width bumps, table-full clear-and-reset
at 4096) so round-trip tests exercise dictionary codes and not just
literals, optional interlace, optional local-color-table layout,
optional 89a graphic-control extension (to exercise the decoder's
extension walk).

All functions raise ImageDecodeError (shared with imagecodec.py) on
malformed payloads so the multimodal quarantine chokepoint handles
dirty crawled bytes uniformly.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError

_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


# -- LZW (GIF variant: LSB-first bit packing, variable code width) ----------

def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """decompress a GIF LZW stream (sub-blocks already concatenated).

    Dictionary resets on CLEAR, stops on EOI (or stream end — some
    encoders omit EOI), grows one code per emitted code, and the code
    width bumps when the next free slot reaches 1 << width (capped at
    12 bits; beyond that the table freezes until a CLEAR, per spec).
    `max_pixels` bounds output so a corrupt stream cannot balloon
    memory (decompression-bomb guard).
    """
    if not 2 <= min_code_size <= 8:
        raise ImageDecodeError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]

    table = None          # populated on the first (mandatory-ish) CLEAR
    width = min_code_size + 1
    prev = None
    out = bytearray()

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # truncated stream: tolerate a missing EOI if we already
                # produced the full raster, else it's malformed
                if len(out) >= max_pixels:
                    return bytes(out)
                raise ImageDecodeError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = base + [b"", b""]  # slots for clear/eoi keep indexing
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if table is None:
            # spec says streams start with CLEAR; tolerate encoders that
            # don't by initializing lazily
            table = base + [b"", b""]
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ImageDecodeError(f"gif: reference to reserved "
                                       f"code {code}")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ImageDecodeError(f"gif: LZW code {code} out of range "
                                   f"(table {len(table)})")
        out += entry
        if len(out) > max_pixels:
            raise ImageDecodeError("gif: LZW output exceeds raster size")
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """compress palette indices as a GIF LZW stream (real dictionary
    compression, not the uncompressed-GIF literal trick, so decoders
    exercise dictionary hits, width growth, and the 4096 reset)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, nxt, width = fresh()
    emit(clear, width)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if nxt < (1 << _MAX_CODE_WIDTH):
            table[wc] = nxt
            # width sync: the decoder's table runs one entry behind the
            # encoder's (it mirrors this add only after reading the NEXT
            # code), so the encoder bumps when the added value itself
            # reaches 1<<width — the decoder's matching bump is at table
            # size 1<<width. Pinned by the published golden GIF in
            # tests/test_gifcodec.py (ecosystem convention).
            if nxt == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            nxt += 1
        else:
            emit(clear, width)
            table, nxt, width = fresh()
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- interlace ----------------------------------------------------------------

#: (start_row, step) per pass, from the GIF spec appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """storage order of rows in an interlaced frame: row k of the
    stream belongs at screen row order[k]."""
    return np.concatenate([np.arange(s, h, t, dtype=np.int64)
                           for s, t in _INTERLACE_PASSES if s < h])


# -- container ----------------------------------------------------------------

def _skip_subblocks(buf: bytes, pos: int) -> int:
    """advance past a length-prefixed sub-block chain (incl. the 0
    terminator) without copying — the frame-seek fast path."""
    n = len(buf)
    while True:
        if pos >= n:
            raise ImageDecodeError("gif: truncated sub-block chain")
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln
        if pos > n:
            raise ImageDecodeError("gif: truncated sub-block")


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ImageDecodeError("gif: truncated sub-block chain")
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise ImageDecodeError("gif: truncated sub-block")
        parts.append(buf[pos:pos + ln])
        pos += ln


def decode_gif(buf: bytes, frame: int = 0) -> np.ndarray:
    """decode one GIF frame to an (H, W, 3) uint8 RGB array.

    frame=0 (the overwhelmingly common still-image case) renders onto
    the logical screen: background-color fill, frame rect placed at its
    offset. frame=k>0 returns that frame's own rect (no disposal
    compositing); frames before k are SKIPPED by sub-block length
    walking only — their LZW streams are never inflated.
    """
    if len(buf) < 13 or buf[:6] not in _MAGICS:
        raise ImageDecodeError(f"gif: bad magic {buf[:6]!r}")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", buf[6:13])
    if sw <= 0 or sh <= 0:
        raise ImageDecodeError(f"gif: bad screen {sw}x{sh}")
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        end = pos + 3 * ncol
        if end > len(buf):
            raise ImageDecodeError("gif: truncated global color table")
        gct = np.frombuffer(buf, np.uint8, 3 * ncol, pos).reshape(ncol, 3)
        pos = end

    seen = 0
    n = len(buf)
    while pos < n:
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= n:
                raise ImageDecodeError("gif: truncated extension")
            pos = _skip_subblocks(buf, pos + 1)
            continue
        if block != 0x2C:
            raise ImageDecodeError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise ImageDecodeError("gif: truncated image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", buf[pos:pos + 9])
        pos += 9
        lct = None
        if fpacked & 0x80:
            ncol = 2 << (fpacked & 0x07)
            end = pos + 3 * ncol
            if end > n:
                raise ImageDecodeError("gif: truncated local color table")
            lct = np.frombuffer(buf, np.uint8, 3 * ncol, pos) \
                .reshape(ncol, 3)
            pos = end
        if pos >= n:
            raise ImageDecodeError("gif: missing LZW min code size")
        mcs = buf[pos]
        pos += 1
        if seen != frame:
            pos = _skip_subblocks(buf, pos)
            seen += 1
            continue

        if fw <= 0 or fh <= 0:
            raise ImageDecodeError(f"gif: bad frame {fw}x{fh}")
        data, pos = _read_subblocks(buf, pos)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ImageDecodeError("gif: no color table for frame")
        idx = np.frombuffer(lzw_decode(data, mcs, fw * fh), np.uint8)
        if len(idx) < fw * fh:
            raise ImageDecodeError(
                f"gif: raster short ({len(idx)} of {fw * fh} px)")
        idx = idx[:fw * fh].reshape(fh, fw)
        if int(idx.max(initial=0)) >= len(palette):
            raise ImageDecodeError("gif: pixel index beyond palette")
        if fpacked & 0x40:
            order = _interlace_order(fh)
            rows = np.empty_like(idx)
            rows[order] = idx
            idx = rows
        rgb = palette[idx]
        if frame > 0:
            return rgb.copy()
        if fx == 0 and fy == 0 and fw == sw and fh == sh:
            return rgb.copy()
        if fx + fw > sw or fy + fh > sh:
            raise ImageDecodeError("gif: frame rect outside screen")
        screen = np.empty((sh, sw, 3), np.uint8)
        bg_rgb = palette[bg] if bg < len(palette) else np.zeros(3, np.uint8)
        screen[:] = bg_rgb
        screen[fy:fy + fh, fx:fx + fw] = rgb
        return screen
    raise ImageDecodeError(f"gif: frame {frame} not present "
                           f"({seen} frames)")


def gif_frame_count(buf: bytes) -> int:
    """count image descriptors by length-walking only (no inflate)."""
    if len(buf) < 13 or buf[:6] not in _MAGICS:
        raise ImageDecodeError(f"gif: bad magic {buf[:6]!r}")
    packed = buf[10]
    pos = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    n = len(buf)
    count = 0
    while pos < n:
        block = buf[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _skip_subblocks(buf, pos + 1)
        elif block == 0x2C:
            if pos + 9 > n:
                raise ImageDecodeError("gif: truncated image descriptor")
            fpacked = buf[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos = _skip_subblocks(buf, pos + 1)
            count += 1
        else:
            raise ImageDecodeError(f"gif: unknown block 0x{block:02x}")
    return count


def encode_gif_indexed(idx: np.ndarray, palette: np.ndarray,
                       interlace: bool = False,
                       local_palette: bool = False,
                       gce: bool = False) -> bytes:
    """encode an (H, W) uint8 index raster + (N, 3) palette as a
    single-frame GIF. Palette length must be a power of two in [2,
    256] (the container stores size as 2^(k+1)). `local_palette`
    stores the table on the image descriptor instead of the screen;
    `gce` prepends a GIF89a graphic-control extension so decoders'
    extension walk is exercised."""
    idx = np.asarray(idx, np.uint8)
    palette = np.asarray(palette, np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"encode_gif_indexed: bad raster {idx.shape}")
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError(f"encode_gif_indexed: bad palette {palette.shape}")
    ncol = len(palette)
    if ncol < 2 or ncol > 256 or ncol & (ncol - 1):
        raise ValueError(f"encode_gif_indexed: palette size {ncol} not a "
                         f"power of two in [2, 256]")
    if int(idx.max(initial=0)) >= ncol:
        raise ValueError("encode_gif_indexed: index beyond palette")
    h, w = idx.shape
    kbits = max(ncol.bit_length() - 1, 1)   # table size field: 2^(k+1)
    version = b"GIF89a" if gce else b"GIF87a"
    out = bytearray(version)
    gflag = 0x00 if local_palette else (0x80 | (kbits - 1))
    out += struct.pack("<HHBBB", w, h, gflag | ((kbits - 1) << 4), 0, 0)
    table = palette.tobytes()
    if not local_palette:
        out += table
    if gce:
        # graphic control: 4-byte body (no transparency), then terminator
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        # and a comment extension so multi-extension walks are tested
        out += b"\x21\xfe\x07synth:1\x00"
    fflag = (0x80 | (kbits - 1)) if local_palette else 0x00
    if interlace:
        fflag |= 0x40
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, fflag)
    if local_palette:
        out += table
    raster = idx[_interlace_order(h)] if interlace else idx
    mcs = max(kbits, 2)
    out.append(mcs)
    stream = lzw_encode(raster.tobytes(), mcs)
    for off in range(0, len(stream), 255):
        chunk = stream[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif(img: np.ndarray, **kw) -> bytes:
    """encode an exact-color RGB (H, W, 3) or gray (H, W) image: builds
    the palette from the distinct colors (must fit 256 — true for
    synthetic/thumbnail payloads; real quantization is out of scope)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_gif: bad shape {img.shape}")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif: {len(palette)} distinct colors "
                         f"(>256); quantize first")
    ncol = 2
    while ncol < len(palette):
        ncol *= 2
    pal = np.zeros((ncol, 3), np.uint8)
    pal[:len(palette)] = palette
    return encode_gif_indexed(inv.reshape(h, w).astype(np.uint8), pal, **kw)
