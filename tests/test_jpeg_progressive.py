"""Progressive JPEG gates (functions/jpegcodec.py, ITU T.81 Annex G).

The load-bearing property: encode_jpeg_progressive transmits EXACTLY
the quantized coefficients the baseline encoder produces (same
_prepare_frame front-end, bit-identical batched DCT), so for ANY input
decode(progressive bytes) == decode(baseline bytes) pixel-for-pixel.
A decoder bug that loses or corrupts a coefficient — in DC successive
approximation, AC spectral bands, EOB-run bookkeeping, or refinement
correction bits — breaks that equality; a symmetric encoder+decoder
format misunderstanding cannot hide because the encoder's input is the
baseline coefficient array itself. The MCU-constant closed form
additionally pins absolute reconstruction (the jpeg_progressive_stats
oracle contract), independent of any decoder."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions.imagecodec import decode_image
from osc_geo_h3grid_srv_spark.functions.jpegcodec import (
    QUANT_LUM, JpegDecodeError, _scaled_quant, decode_jpeg, encode_jpeg,
    encode_jpeg_progressive)


def _closed_form(v: int, q: int) -> int:
    dcq = np.floor(8.0 * (v - 128) / q + 0.5)
    return int(np.clip(np.floor(dcq * q / 8.0 + 128.5 + 1e-7), 0, 255))


def _smooth(img, rounds=2):
    f = img.astype(float)
    for _ in range(rounds):
        f = (f + np.roll(f, 1, 0) + np.roll(f, 1, 1)) / 3
    return f.astype(np.uint8)


@pytest.mark.parametrize("shape,sub", [
    ((16, 16), "4:4:4"), ((24, 40, 3), "4:4:4"), ((24, 40, 3), "4:2:0"),
    ((13, 17), "4:4:4"), ((9, 23, 3), "4:2:0"), ((1, 1, 3), "4:2:0"),
    ((33, 31, 3), "4:2:0"), ((17, 16, 3), "4:4:4")])
@pytest.mark.parametrize("quality", [30, 60, 90, 95])
def test_progressive_equals_baseline_pixels(shape, sub, quality):
    rng = np.random.default_rng(hash((shape, quality)) % 2**32)
    for smooth in (0, 2):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        if smooth:
            img = _smooth(img, smooth)
        base = decode_jpeg(encode_jpeg(img, quality, sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality, sub))
        assert (base == prog).all(), (shape, sub, quality, smooth)


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_progressive_restart_intervals(ri):
    # RSTn inside every scan type: DC predictors AND the EOB run must
    # reset at each marker or coefficients shear off the closed form
    rng = np.random.default_rng(ri)
    img = rng.integers(0, 256, (33, 31, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 80, "4:2:0"))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, 80, "4:2:0", restart_interval=ri))
    assert (base == prog).all()


def test_custom_scan_scripts():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 85, "4:4:4"))
    # single-level spectral selection, no successive approximation
    flat = [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
            ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    assert (decode_jpeg(encode_jpeg_progressive(
        img, 85, "4:4:4", scans=flat)) == base).all()
    # non-interleaved DC scans + successive approximation
    nonint = [([0], 0, 0, 0, 1), ([1], 0, 0, 0, 1), ([2], 0, 0, 0, 1),
              ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0),
              ([2], 1, 63, 0, 0),
              ([0], 0, 0, 1, 0), ([1], 0, 0, 1, 0), ([2], 0, 0, 1, 0)]
    assert (decode_jpeg(encode_jpeg_progressive(
        img, 85, "4:4:4", scans=nonint)) == base).all()
    # many narrow AC bands at three successive-approximation levels —
    # stresses EOB-run + refinement interplay per band
    bands = [([0, 1, 2], 0, 0, 0, 1)]
    for ci in (0, 1, 2):
        for lo, hi in ((1, 2), (3, 9), (10, 35), (36, 63)):
            bands.append(([ci], lo, hi, 0, 2))
    for ci in (0, 1, 2):
        for lo, hi in ((1, 2), (3, 9), (10, 35), (36, 63)):
            bands.append(([ci], lo, hi, 2, 1))
            bands.append(([ci], lo, hi, 1, 0))
    bands.append(([0, 1, 2], 0, 0, 1, 0))
    assert (decode_jpeg(encode_jpeg_progressive(
        img, 85, "4:4:4", scans=bands)) == base).all()


@pytest.mark.parametrize("quality,qdc", [(60, 13), (80, 6), (90, 3),
                                         (95, 2)])
@pytest.mark.parametrize("mode", ["gray", "rgb444", "rgb420"])
def test_progressive_constant_closed_form(quality, qdc, mode):
    # the jpeg_progressive_stats oracle contract: MCU-constant source
    # reconstructs to the analytic constant through the full scan script
    assert int(_scaled_quant(QUANT_LUM, quality)[0]) == qdc
    for v in (0, 3, 77, 127, 128, 200, 255):
        img = np.full((16, 32), v, np.uint8)
        sub = "4:4:4"
        if mode != "gray":
            img = np.repeat(img[:, :, None], 3, axis=2)
            sub = "4:2:0" if mode == "rgb420" else "4:4:4"
        dec = decode_jpeg(encode_jpeg_progressive(img, quality, sub))
        assert dec.shape == img.shape
        exp = _closed_form(v, qdc)
        assert int(dec.min()) == int(dec.max()) == exp, (v, quality)


def test_dispatcher_routes_progressive():
    img = np.full((8, 8), 99, np.uint8)
    buf = encode_jpeg_progressive(img, 95)
    assert buf[:2] == b"\xFF\xD8" and b"\xFF\xC2" in buf
    assert decode_image(buf).shape == (8, 8)


def test_progressive_robustness():
    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
    buf = encode_jpeg_progressive(img, 90)
    with pytest.raises(JpegDecodeError):
        decode_jpeg(buf[: len(buf) // 2])  # truncated mid-scan
    with pytest.raises(JpegDecodeError):
        # SOF2 with no SOS at all
        sos = buf.index(b"\xFF\xDA")
        decode_jpeg(buf[:sos] + b"\xFF\xD9")


def test_progressive_mutation_fuzz_quarantine():
    # single-byte flips + truncations must raise ImageDecodeError
    # through the dispatcher (quarantine contract), never anything else
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        ImageDecodeError)
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    buf = encode_jpeg_progressive(img, 80, "4:2:0")
    for i in range(400):
        b = bytearray(buf)
        if i % 3 == 0:
            b = b[: rng.integers(2, len(b))]
        else:
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        try:
            decode_image(bytes(b))
        except ImageDecodeError:
            pass
