"""Golden/property tests for the pure-NumPy BMP + Netpbm codecs
(functions/imagecodec.py) and the real-decode multimodal pipeline."""

import struct

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions import imagecodec as ic


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(5, 7, 3), (1, 1, 3), (16, 13, 3),
                                   (3, 4, 3)])
def test_bmp_rgb_roundtrip(shape):
    # odd widths exercise the 4-byte row padding
    img = _rand(shape, sum(shape))
    back = ic.decode_bmp(ic.encode_bmp(img))
    assert back.shape == img.shape
    assert (back == img).all()


def test_bmp_gray_input_expands_to_rgb():
    g = _rand((6, 5), 1)
    back = ic.decode_bmp(ic.encode_bmp(g))
    assert back.shape == (6, 5, 3)
    assert (back[:, :, 0] == g).all() and (back[:, :, 2] == g).all()


def test_bmp_topdown_negative_height():
    img = _rand((4, 6, 3), 2)
    buf = bytearray(ic.encode_bmp(img))
    # flip to top-down: negate height, reorder rows accordingly
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)
    row_bytes = (6 * 3 + 3) & ~3
    body = bytes(buf[54:])
    rows = [body[i * row_bytes:(i + 1) * row_bytes] for i in range(4)]
    buf[54:] = b"".join(reversed(rows))
    back = ic.decode_bmp(bytes(buf))
    assert (back == img).all()


def test_bmp_8bit_grayscale_palette():
    # hand-build an 8-bit BMP with an identity grayscale palette
    img = _rand((3, 5), 3)
    row_bytes = (5 + 3) & ~3
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    body = b"".join(img[::-1][r].tobytes() + b"\x00" * (row_bytes - 5)
                    for r in range(3))
    data_off = 14 + 40 + len(pal)
    head = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                                data_off)
            + struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 8, 0, len(body),
                          0, 0, 256, 0))
    back = ic.decode_bmp(head + pal + body)
    assert back.shape == (3, 5)
    assert (back == img).all()


@pytest.mark.parametrize("shape", [(4, 6), (4, 6, 3), (1, 1), (9, 2, 3)])
def test_pnm_roundtrip(shape):
    img = _rand(shape, sum(shape))
    back = ic.decode_pnm(ic.encode_ppm(img))
    assert back.shape == img.shape
    assert (back == img).all()


def test_pnm_header_comments_and_whitespace():
    img = _rand((2, 3, 3), 9)
    buf = b"P6 # inline comment\n# full line\n  3\t2 # dims\n255\n" \
        + img.tobytes()
    back = ic.decode_pnm(buf)
    assert (back == img).all()


@pytest.mark.parametrize("buf,msg", [
    (b"P7\n1 1\n255\nX", "magic"),
    (b"P6\n2 2\n255\nshort", "truncated raster"),
    (b"P6\n0 2\n255\n", "dimensions"),
    (b"P6\n2 2\n70000\n", "maxval"),
    (b"BMxxxxxxxxxxxx", "not a BM|truncated"),
    (b"\x89PNG\r\n\x1a\n", "missing IHDR/IDAT"),
    # JPEG magic now routes to the real baseline decoder (round 4),
    # which quarantines this truncated stream with its own message
    (b"\xff\xd8\xff\xe0jpeg", "jpeg: truncated"),
    # GIF is a real decoder since round 4; a bare magic is truncated
    (b"GIF89a......", "gif"),
    (b"RIFFxxxxWEBP", "unknown image container"),
])
def test_decode_errors(buf, msg):
    with pytest.raises(ic.ImageDecodeError, match=msg):
        ic.decode_image(buf) if not buf[:2] in (b"P6", b"P7") \
            else ic.decode_pnm(buf)


def test_bmp_compressed_rejected():
    buf = bytearray(ic.encode_bmp(_rand((2, 2, 3), 4)))
    struct.pack_into("<I", buf, 30, 1)  # BI_RLE8
    with pytest.raises(ic.ImageDecodeError, match="compression"):
        ic.decode_bmp(bytes(buf))


def test_decode_image_dispatch():
    img = _rand((3, 3, 3), 5)
    assert (ic.decode_image(ic.encode_bmp(img)) == img).all()
    assert (ic.decode_image(ic.encode_ppm(img)) == img).all()


def test_decode_pixel_stats_mixed_payloads(spark):
    """the distributed decode path: BMP + PPM + garbage in one batch;
    garbage is quarantined in the error column, not a job failure."""
    from osc_geo_h3grid_srv_spark.operators.multimodal import (
        decode_pixel_stats)
    img = _rand((4, 5, 3), 6)
    rows = [(1, "image", 5, 4, 1, bytearray(ic.encode_bmp(img))),
            (2, "image", 5, 4, 1, bytearray(ic.encode_ppm(img))),
            (3, "image", 0, 0, 1, bytearray(b"\xff\xd8JPEGish"))]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, width int, height int, "
              "n_frames int, payload binary")
    out = {r["doc_id"]: r for r in decode_pixel_stats(media).collect()}
    for did in (1, 2):
        r = out[did]
        assert (r["width"], r["height"], r["channels"]) == (5, 4, 3)
        assert r["px_sum"] == int(img.sum())
        assert r["error"] is None
    assert out[3]["error"] is not None and out[3]["px_sum"] is None


def test_synth_image_media_payloads_are_valid_containers(spark):
    # PPM rows parse as PPM; every third row is a PNG of the SAME
    # recipe pixels (container-independent stats)
    from osc_geo_h3grid_srv_spark.operators.multimodal import (
        synth_image_media)
    rows = synth_image_media(spark, 20, partitions=2).collect()
    assert len(rows) == 20
    n_png = 0
    for r in rows:
        buf = bytes(r["payload"])
        if r["doc_id"] % 3 == 2:
            assert buf[:8] == b"\x89PNG\r\n\x1a\n"
            img = ic.decode_png(buf)
            n_png += 1
        else:
            assert buf[:2] == b"P6"
            img = ic.decode_pnm(buf)
        assert img.shape == (r["height"], r["width"], 3)
        assert np.array_equal(ic.decode_image(buf), img)
    assert n_png == 6


def test_bmp_malformed_palette_quarantines():
    """truncated palette and out-of-range palette indices must raise
    ImageDecodeError (the quarantine type), never bare numpy errors."""
    import struct

    import numpy as np
    import pytest

    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        ImageDecodeError, decode_bmp)

    def bmp8(n_colors, pal_bytes, pix):
        h, w = pix.shape
        row_bytes = (w + 3) & ~3
        body = bytearray()
        for row in pix[::-1]:
            body += row.tobytes() + b"\x00" * (row_bytes - w)
        data_off = 14 + 40 + len(pal_bytes)
        head = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                                    data_off)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                              len(body), 2835, 2835, n_colors, 0))
        return bytes(head) + pal_bytes + bytes(body)

    pix = np.arange(16, dtype=np.uint8).reshape(4, 4)
    # declares 256 colors but ships only 4 entries
    with pytest.raises(ImageDecodeError, match="palette"):
        decode_bmp(bmp8(0, bytes(4 * 4), pix))
    # 4-color palette but pixel indices reach 15
    with pytest.raises(ImageDecodeError, match="palette index"):
        decode_bmp(bmp8(4, bytes(4 * 4), pix))
    # color palette where B==G but R differs must NOT be treated as gray
    pal = bytes([10, 10, 99, 0] * 16)  # BGRA: B==G=10, R=99
    out = decode_bmp(bmp8(16, pal, pix))
    assert out.ndim == 3 and out.shape == (4, 4, 3)
    assert (out[0, 0] == [99, 10, 10]).all()  # RGB order


def _img_rgb(h, w, seed=3):
    import numpy as np
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype="uint8")


def test_png_roundtrip_every_filter_type():
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        decode_png, encode_png)
    img = _img_rgb(13, 7)
    gray = img[:, :, 0]
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(img, ft)), img), ft
        assert np.array_equal(decode_png(encode_png(gray, ft)), gray), ft


def test_png_adam7_roundtrip():
    # round 4 (VERDICT r3 Next #9): 7-pass de-interlace, every filter
    # type, RGB + gray, edge dims where most passes are empty
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        decode_png, encode_png)
    rng = np.random.default_rng(42)
    for shape in ((1, 1), (2, 2), (7, 5), (13, 21, 3), (16, 1),
                  (1, 16, 3), (8, 8, 3), (9, 10)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(img, filter_type=ft,
                                        interlace=True))
            assert np.array_equal(got, img), (shape, ft)
    # interlaced and null-method encodings of the same raster decode
    # to identical pixels (the property the recipe oracle leans on)
    img = rng.integers(0, 256, (11, 6, 3), dtype=np.uint8)
    a = decode_png(encode_png(img, 2, interlace=True))
    b = decode_png(encode_png(img, 2, interlace=False))
    assert np.array_equal(a, b)


def test_png_via_dispatcher_and_palette_alpha():
    import struct
    import zlib
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        _PNG_MAGIC, decode_image, decode_png)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # palette image: 2x2 indices into a 3-color palette
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # filter 0 rows: [0,1], [2,1]
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_image(png)
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[1, 0].tolist() == [0, 0, 255]

    # RGBA: alpha dropped
    ihdr6 = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    raw6 = bytes([0, 10, 20, 30, 99])
    png6 = (_PNG_MAGIC + chunk(b"IHDR", ihdr6)
            + chunk(b"IDAT", zlib.compress(raw6)) + chunk(b"IEND", b""))
    assert decode_png(png6)[0, 0].tolist() == [10, 20, 30]


def test_png_malformed_quarantine_paths():
    import struct
    import zlib
    import numpy as np
    import pytest
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        _PNG_MAGIC, ImageDecodeError, decode_png, encode_png)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    good = encode_png(_img_rgb(4, 4))
    with pytest.raises(ImageDecodeError):
        decode_png(b"\x89PNX" + good[4:])  # bad signature
    with pytest.raises(ImageDecodeError):
        decode_png(good[:40])  # truncated
    # Adam7 is decoded as of round 4; a garbage interlaced stream
    # (pass 6 filter byte = 0x61) must still quarantine, and unknown
    # interlace methods are refused outright
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00aa\x00aa"))
           + chunk(b"IEND", b""))
    with pytest.raises(ImageDecodeError):
        decode_png(png)
    ihdr2m = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    png2m = (_PNG_MAGIC + chunk(b"IHDR", ihdr2m)
             + chunk(b"IDAT", zlib.compress(b"\x00aa\x00aa"))
             + chunk(b"IEND", b""))
    with pytest.raises(ImageDecodeError, match="interlace"):
        decode_png(png2m)
    # corrupt zlib stream
    bad = good.replace(b"IDAT", b"IDAT")  # locate idat, flip payload
    i = bad.find(b"IDAT") + 4
    bad = bad[:i + 2] + bytes([bad[i + 2] ^ 0xFF]) + bad[i + 3:]
    with pytest.raises(ImageDecodeError):
        decode_png(bad)
    # palette index out of range
    ihdr3 = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    png3 = (_PNG_MAGIC + chunk(b"IHDR", ihdr3)
            + chunk(b"PLTE", bytes([1, 2, 3]))
            + chunk(b"IDAT", zlib.compress(bytes([0, 9])))
            + chunk(b"IEND", b""))
    with pytest.raises(ImageDecodeError):
        decode_png(png3)


def test_dispatcher_normalizes_parse_errors():
    """decode_image is the crash-proofing chokepoint: payloads with a
    valid magic but corrupt internals must raise ImageDecodeError (the
    type the per-row quarantine handlers catch), never a raw
    struct.error / ValueError / zlib.error that would kill a batch."""
    # truncated JPEG SOF segment -> struct.unpack on a short slice
    cases = [
        b"\xFF\xD8\xFF\xC0\x00\x04\x08\x00\xFF\xD9",
        # truncated DQT body -> np.frombuffer length error
        b"\xFF\xD8\xFF\xDB\x00\x05\x00\x01\x02\xFF\xD9",
        # short SOS component list -> slice unpack
        b"\xFF\xD8\xFF\xDA\x00\x04\x01\x00",
        # PNG magic + garbage (short chunk header) -> struct.error
        b"\x89PNG\r\n\x1a\n\x00\x00",
    ]
    for buf in cases:
        with pytest.raises(ic.ImageDecodeError):
            ic.decode_image(buf)


def test_dispatcher_mutation_fuzz():
    """deterministic corruption sweep: every single-byte mutation of a
    real PNG and JPEG either decodes or raises ImageDecodeError —
    nothing else escapes the dispatcher."""
    from osc_geo_h3grid_srv_spark.functions.jpegcodec import encode_jpeg
    img = _rand((9, 11, 3), 42)
    for good in (ic.encode_png(img), encode_jpeg(img, quality=80),
                 ic.encode_bmp(img), ic.encode_ppm(img)):
        rs = np.random.RandomState(len(good))
        for _ in range(300):
            pos = int(rs.randint(0, len(good)))
            val = int(rs.randint(0, 256))
            bad = good[:pos] + bytes([val]) + good[pos + 1:]
            try:
                ic.decode_image(bad)
            except ic.ImageDecodeError:
                pass
        # truncations at every eighth byte
        for cut in range(0, len(good), 8):
            try:
                ic.decode_image(good[:cut])
            except ic.ImageDecodeError:
                pass
