"""Baseline JPEG codec gates (functions/jpegcodec.py, ITU T.81).

JPEG is lossy, so the suite pins three distinct layers:
* exact closed-form reconstruction on MCU-constant images (the
  determinism contract the jpeg_decode_stats oracle replays),
* PSNR bounds on smooth content across subsampling modes, qualities,
  and restart intervals (the full DCT/Huffman path),
* structural/robustness behavior: marker walk, unsupported-profile
  quarantine, dispatcher integration.
"""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions.imagecodec import decode_image
from osc_geo_h3grid_srv_spark.functions.jpegcodec import (
    QUANT_LUM, JpegDecodeError, _scaled_quant, decode_jpeg, encode_jpeg)


def _closed_form(v: int, q: int) -> int:
    dcq = np.floor(8.0 * (v - 128) / q + 0.5)
    return int(np.clip(np.floor(dcq * q / 8.0 + 128.5 + 1e-7), 0, 255))


@pytest.mark.parametrize("quality,qdc", [(60, 13), (80, 6), (90, 3),
                                         (95, 2)])
def test_dc_quantizers_pin_quality_curve(quality, qdc):
    # the oracle's literal DC quantizers per quality — a change to the
    # IJG scaling curve or Annex K table must fail here first
    assert int(_scaled_quant(QUANT_LUM, quality)[0]) == qdc


@pytest.mark.parametrize("quality", [60, 80, 90, 95])
@pytest.mark.parametrize("mode", ["gray", "rgb444", "rgb420"])
def test_constant_blocks_exact_closed_form(quality, mode):
    q = int(_scaled_quant(QUANT_LUM, quality)[0])
    for v in (0, 3, 77, 127, 128, 200, 255):
        img = np.full((16, 32), v, np.uint8)
        sub = "4:4:4"
        if mode != "gray":
            img = np.repeat(img[:, :, None], 3, axis=2)
            sub = "4:2:0" if mode == "rgb420" else "4:4:4"
        dec = decode_jpeg(encode_jpeg(img, quality, sub))
        assert dec.shape == img.shape
        exp = _closed_form(v, q)
        assert int(dec.min()) == int(dec.max()) == exp, (v, quality)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("ri", [0, 3])
def test_smooth_gradient_psnr(sub, ri):
    yy, xx = np.mgrid[0:40, 0:56]
    img = (np.stack([yy * 2, xx * 2, yy + xx], 2) % 200 + 20) \
        .astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub,
                                  restart_interval=ri))
    assert dec.shape == img.shape
    mse = ((dec.astype(float) - img) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 40, psnr


def test_noise_image_quality_ladder():
    # reconstruction error must decrease monotonically-ish with quality
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    # smooth it so quality has something to preserve
    img = base.astype(float)
    for _ in range(3):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
    img = img.astype(np.uint8)
    errs = []
    for quality in (30, 60, 90):
        dec = decode_jpeg(encode_jpeg(img, quality, "4:4:4"))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]
    # np.roll smoothing wraps, so block edges at the borders keep the
    # q90 residual well above a photographic baseline — bound loosely
    assert errs[2] < 7.0


def test_odd_dimensions_and_grayscale():
    rng = np.random.default_rng(5)
    for shape in ((13, 17), (9, 23, 3), (8, 8), (1, 1, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 90, "4:2:0"
                                      if len(shape) == 3 else "4:4:4"))
        assert dec.shape == img.shape


def test_restart_interval_resyncs_dc_prediction():
    # block-constant tiles with restart markers: DC predictors reset at
    # every RST, so decode must still be exact per the closed form
    q = int(_scaled_quant(QUANT_LUM, 90)[0])
    tiles = np.array([[10, 250, 60], [200, 30, 140]], np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    dec = decode_jpeg(encode_jpeg(img, 90, restart_interval=1))
    exp = np.repeat(np.repeat(
        np.vectorize(lambda v: _closed_form(int(v), q))(tiles), 8, 0),
        8, 1)
    assert (dec == exp).all()


def test_dispatcher_routes_jpeg():
    img = np.full((8, 8), 99, np.uint8)
    buf = encode_jpeg(img, 95)
    assert buf[:2] == b"\xFF\xD8"
    out = decode_image(buf)
    assert out.shape == (8, 8)


def test_unsupported_profiles_quarantine():
    good = encode_jpeg(np.full((8, 8), 50, np.uint8), 90)
    # arithmetic-coded SOF9: flip the SOF0 marker byte (progressive
    # SOF2 decodes since round 5 — see test_jpeg_progressive.py)
    arith = good.replace(b"\xFF\xC0", b"\xFF\xC9", 1)
    with pytest.raises(JpegDecodeError, match="arithmetic"):
        decode_jpeg(arith)
    # a baseline full-band scan mislabeled SOF2 is structurally invalid
    # progressive (DC scan must have Se == 0) — quarantined, not crashed
    with pytest.raises(JpegDecodeError):
        decode_jpeg(good.replace(b"\xFF\xC0", b"\xFF\xC2", 1))
    with pytest.raises(JpegDecodeError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good[2:])
    with pytest.raises(JpegDecodeError):
        decode_jpeg(good[:40])  # truncated mid-segment
    # entropy data cut off mid-scan
    with pytest.raises(JpegDecodeError):
        big = encode_jpeg(np.arange(64 * 64, dtype=np.uint8)
                          .reshape(64, 64) % 251, 95)
        decode_jpeg(big[: len(big) // 2])


def test_quality_domain():
    img = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(img, 0)
    with pytest.raises(ValueError):
        encode_jpeg(img, 101)
    with pytest.raises(ValueError):
        encode_jpeg(img, 90, subsampling="4:1:1")
