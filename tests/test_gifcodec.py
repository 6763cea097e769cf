"""GIF codec gates (functions/gifcodec.py, GIF87a/89a public spec).

GIF is lossless for <=256-color rasters, so round trips are exact.
The suite pins:
* LZW layer: literal runs, dictionary hits, code-width growth to the
  12-bit cap, the 4096 table-full clear-and-reset, truncated streams,
* container layer: global vs local color tables, interlace reordering,
  extension-block walking (89a GCE + comment), frame seek without
  inflating skipped frames, background compositing of partial frames,
* dispatcher integration + quarantine on malformed payloads.
"""

import struct

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions.gifcodec import (
    _interlace_order, decode_gif, encode_gif, encode_gif_indexed,
    gif_frame_count, lzw_decode, lzw_encode)
from osc_geo_h3grid_srv_spark.functions.imagecodec import (
    ImageDecodeError, decode_image)


def _rng_idx(h, w, ncol, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, ncol, size=(h, w)).astype(np.uint8)


def _pal(ncol):
    c = np.arange(ncol, dtype=np.int64)
    return np.stack([(c * 37 + 11) % 256, (c * 73 + 29) % 256,
                     (c * 151 + 47) % 256], axis=1).astype(np.uint8)


# -- published golden ----------------------------------------------------------

def test_published_golden_gif():
    """the GIF89a walkthrough sample published with the spec tutorial
    ecosystem (10x10, 4-color, GCE): produced by a third-party encoder,
    so it pins the LZW width-bump convention against the real world —
    a self-consistent-but-off-by-one codec pair fails here."""
    hexs = ("47 49 46 38 39 61 0A 00 0A 00 91 00 00 FF FF FF FF 00 00 "
            "00 00 FF 00 00 00 21 F9 04 00 00 00 00 00 2C 00 00 00 00 "
            "0A 00 0A 00 00 02 16 8C 2D 99 87 2A 1C DC 33 A0 02 75 EC "
            "95 FA A8 DE 60 8C 04 91 4C 01 00 3B")
    buf = bytes(int(x, 16) for x in hexs.split())
    expected = np.array(
        [[1, 1, 1, 1, 1, 2, 2, 2, 2, 2]] * 3
        + [[1, 1, 1, 0, 0, 0, 0, 2, 2, 2]] * 2
        + [[2, 2, 2, 0, 0, 0, 0, 1, 1, 1]] * 2
        + [[2, 2, 2, 2, 2, 1, 1, 1, 1, 1]] * 3)
    pal = np.array([[255, 255, 255], [255, 0, 0], [0, 0, 255],
                    [0, 0, 0]], np.uint8)
    assert gif_frame_count(buf) == 1
    np.testing.assert_array_equal(decode_gif(buf), pal[expected])


# -- LZW ---------------------------------------------------------------------

@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = np.random.RandomState(mcs)
    data = rng.randint(0, 1 << mcs, size=5000).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, mcs), mcs, len(data)) == data


def test_lzw_roundtrip_repetitive_hits_dictionary():
    # long repeats drive deep dictionary strings and width growth
    data = (b"\x00\x01\x02\x03" * 3000)
    enc = lzw_encode(data, 2)
    assert len(enc) < len(data) // 2  # actually compresses
    assert lzw_decode(enc, 2, len(data)) == data


def test_lzw_table_full_reset_at_4096():
    # 8-bit alphabet, ~100k varied symbols: the dictionary must hit
    # 4096 and clear-reset at least once, and still round-trip
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=100_000).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 8), 8, len(data)) == data


def test_lzw_kwkwk_case():
    # the classic cScSc pattern forces code == len(table) (entry being
    # defined is referenced before it is complete)
    data = b"\x01\x01\x01\x01\x01\x01\x01"
    assert lzw_decode(lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_truncated_stream_raises():
    data = b"\x00\x01\x02\x03" * 50
    enc = lzw_encode(data, 2)
    with pytest.raises(ImageDecodeError):
        lzw_decode(enc[: len(enc) // 2], 2, len(data))


def test_lzw_bad_code_raises():
    # a code far beyond the table: 6 bits of 1s at width 3 after clear
    # stream: clear(4=100b) then code 7 (111b) -> table len 6, 7 > 6
    acc = 0b111_100  # LSB-first: clear then 7
    with pytest.raises(ImageDecodeError):
        lzw_decode(bytes([acc]), 2, 100)


# -- container round trips -----------------------------------------------------

@pytest.mark.parametrize("ncol", [4, 16, 64, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_indexed_roundtrip(ncol, interlace):
    idx = _rng_idx(23, 17, ncol, seed=ncol)
    pal = _pal(ncol)
    buf = encode_gif_indexed(idx, pal, interlace=interlace)
    out = decode_gif(buf)
    assert out.shape == (23, 17, 3)
    np.testing.assert_array_equal(out, pal[idx])


@pytest.mark.parametrize("local_palette", [False, True])
@pytest.mark.parametrize("gce", [False, True])
def test_layout_variants_decode_identically(local_palette, gce):
    idx = _rng_idx(9, 31, 16)
    pal = _pal(16)
    buf = encode_gif_indexed(idx, pal, local_palette=local_palette,
                             gce=gce)
    assert buf[:6] == (b"GIF89a" if gce else b"GIF87a")
    np.testing.assert_array_equal(decode_gif(buf), pal[idx])


def test_encode_gif_rgb_and_gray():
    img = np.zeros((8, 8, 3), np.uint8)
    img[::2, ::2] = (200, 10, 30)
    img[1::2, 1::2] = (5, 250, 90)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)
    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    out = decode_gif(encode_gif(gray))
    np.testing.assert_array_equal(out, np.stack([gray] * 3, axis=-1))


def test_encode_gif_too_many_colors_rejected():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(img)


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 3, 4, 7, 8, 9, 64):
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))


def test_interlaced_bytes_differ_but_decode_equal():
    idx = _rng_idx(16, 8, 4)
    pal = _pal(4)
    a = encode_gif_indexed(idx, pal, interlace=False)
    b = encode_gif_indexed(idx, pal, interlace=True)
    assert a != b
    np.testing.assert_array_equal(decode_gif(a), decode_gif(b))


# -- multi-frame seek ----------------------------------------------------------

def _two_frame_gif(idx_a, idx_b, pal):
    """splice two single-frame encodes into one animation container:
    header+LSD from the first, both image blocks (local palettes),
    one trailer."""
    a = encode_gif_indexed(idx_a, pal, local_palette=True)
    b = encode_gif_indexed(idx_b, pal, local_palette=True)
    return a[:13] + a[13:-1] + b[13:-1] + b"\x3b"


def test_frame_seek_and_count():
    pal = _pal(16)
    ia = _rng_idx(6, 6, 16, seed=1)
    ib = _rng_idx(6, 6, 16, seed=2)
    buf = _two_frame_gif(ia, ib, pal)
    assert gif_frame_count(buf) == 2
    np.testing.assert_array_equal(decode_gif(buf, frame=0), pal[ia])
    np.testing.assert_array_equal(decode_gif(buf, frame=1), pal[ib])
    with pytest.raises(ImageDecodeError, match="frame 2 not present"):
        decode_gif(buf, frame=2)


def test_frame_seek_skips_corrupt_earlier_frames():
    # frame 0's LZW payload is garbage, but frame 1 must still decode:
    # the seek walks sub-block lengths only and never inflates frame 0
    pal = _pal(16)
    ia = _rng_idx(6, 6, 16, seed=3)
    ib = _rng_idx(6, 6, 16, seed=4)
    a = encode_gif_indexed(ia, pal, local_palette=True)
    b = encode_gif_indexed(ib, pal, local_palette=True)
    body_a = bytearray(a[13:-1])
    # corrupt frame a's LZW min-code-size byte (after the 10-byte
    # descriptor + 48-byte local table) to the invalid value 1 — block
    # walking is unaffected, inflating frame a must fail
    body_a[10 + 48] = 1
    buf = a[:13] + bytes(body_a) + b[13:-1] + b"\x3b"
    np.testing.assert_array_equal(decode_gif(buf, frame=1), pal[ib])
    with pytest.raises(ImageDecodeError):
        decode_gif(buf, frame=0)


def test_partial_frame_composites_on_background():
    # hand-build: 6x4 screen, global 4-color table, frame rect 2x2 at
    # (3,1), background color 2
    pal = _pal(4)
    idx = np.array([[0, 1], [3, 2]], np.uint8)
    inner = encode_gif_indexed(idx, pal)  # steal its LZW section
    # inner layout: 6 magic + 7 LSD + 12 GCT + 10 descriptor, then data
    data_section = inner[6 + 7 + 12 + 10:-1]  # mcs..subblock terminator
    buf = (b"GIF87a" + struct.pack("<HHBBB", 6, 4, 0x80 | 1, 2, 0)
           + pal.tobytes()
           + b"\x2c" + struct.pack("<HHHHB", 3, 1, 2, 2, 0)
           + data_section + b"\x3b")
    out = decode_gif(buf)
    assert out.shape == (4, 6, 3)
    np.testing.assert_array_equal(out[1:3, 3:5], pal[idx])
    assert (out[0] == pal[2]).all() and (out[3] == pal[2]).all()


# -- robustness / dispatcher ---------------------------------------------------

def test_dispatcher_routes_gif():
    idx = _rng_idx(5, 5, 4)
    pal = _pal(4)
    np.testing.assert_array_equal(decode_image(encode_gif_indexed(idx, pal)),
                                  pal[idx])


@pytest.mark.parametrize("mutate", [
    lambda b: b[:5],                          # truncated magic
    lambda b: b"GIX87a" + b[6:],              # bad magic
    lambda b: b[:20],                         # truncated color table
    lambda b: b[:-2],                         # missing trailer+terminator
    # unknown block type injected after the 16-color GCT (13 + 48)
    lambda b: b[:61] + b"\x99" + b[61:],
])
def test_malformed_payloads_quarantine(mutate):
    buf = encode_gif_indexed(_rng_idx(8, 8, 16), _pal(16))
    with pytest.raises(ImageDecodeError):
        decode_gif(mutate(buf))


def test_index_beyond_palette_rejected():
    # 4-entry palette but an index of 200 in the stream: encode with a
    # 256-entry table, then shrink the stored table size field
    idx = np.full((4, 4), 200, np.uint8)
    buf = bytearray(encode_gif_indexed(idx, _pal(256)))
    # LSD packed byte at offset 10: global table, size field -> 4 colors
    buf[10] = (buf[10] & 0xF8) | 0x01
    # drop palette bytes [13+12 : 13+768] so the container stays aligned
    del buf[13 + 12: 13 + 768]
    with pytest.raises(ImageDecodeError):
        decode_gif(bytes(buf))
