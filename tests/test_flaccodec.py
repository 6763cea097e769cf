"""FLAC codec gates (functions/flaccodec.py, RFC 9639 / xiph FLAC).

FLAC is lossless, so the load-bearing property is exact PCM round-trip
under EVERY encoder parameterization — subframe types (constant /
verbatim / fixed 0-4 / LPC), Rice partition orders, escape partitions,
wasted bits, stereo decorrelation modes, block sizes with short last
frames — plus cross-container agreement with the WAV path on identical
PCM (the audio_afp_pairs hash-unchanged contract) and CRC/structure
robustness (quarantine, never crash)."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions.audiocodec import (
    AudioDecodeError, decode_audio, decode_wav, encode_wav)
from osc_geo_h3grid_srv_spark.functions.flaccodec import (
    FlacDecodeError, decode_flac, encode_flac)


def _rt(pcm, rate=8000, **kw):
    dec, r = decode_flac(encode_flac(pcm, rate, **kw))
    exp = np.asarray(pcm, dtype=np.int16)
    if exp.ndim == 1:
        exp = exp[:, None]
    assert r == rate and dec.shape == exp.shape
    assert (dec == exp).all(), kw
    return dec


@pytest.mark.parametrize("subframe", ["auto", "verbatim", "fixed0",
                                      "fixed1", "fixed2", "fixed3",
                                      "fixed4", "lpc"])
def test_mono_roundtrip_all_subframes(subframe):
    rng = np.random.default_rng(1)
    _rt(rng.integers(-32768, 32768, 1000, dtype=np.int16),
        subframe=subframe)


def test_constant_subframe():
    _rt(np.full(700, -123, np.int16), subframe="constant")
    _rt(np.full(5, -32768, np.int16))  # auto picks constant


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
@pytest.mark.parametrize("subframe", ["auto", "lpc"])
def test_stereo_decorrelation_roundtrip(mode, subframe):
    rng = np.random.default_rng(2)
    st = rng.integers(-32768, 32768, (777, 2), dtype=np.int16)
    _rt(st, stereo_mode=mode, subframe=subframe)


@pytest.mark.parametrize("bs", [64, 192, 256, 1000])
@pytest.mark.parametrize("porder", [0, 1, 2, 3])
def test_block_sizes_and_partition_orders(bs, porder):
    # 1000 % 256 != 0 -> short last frame; porder legality auto-clamped
    rng = np.random.default_rng(bs * 7 + porder)
    _rt(rng.integers(-32768, 32768, 1000, dtype=np.int16),
        block_size=bs, partition_order=porder)


def test_escape_partitions():
    rng = np.random.default_rng(3)
    small = rng.integers(-100, 100, 512).astype(np.int16)
    _rt(small, subframe="fixed1", escape_bits=12)
    # raw width 0 is the spec's all-zero form: a linear ramp has zero
    # order-2 residuals (x[i] == 2x[i-1] - x[i-2] exactly)
    ramp = np.full(512, 7, np.int16).cumsum().astype(np.int16)
    _rt(ramp, subframe="fixed2", escape_bits=0)


def test_wasted_bits():
    rng = np.random.default_rng(4)
    w = (rng.integers(-2000, 2000, 600) * 8).astype(np.int16)
    _rt(w, use_wasted=True)
    st = np.stack([w, (w // 8 * 4)], 1).astype(np.int16)
    _rt(st, stereo_mode="mid_side", use_wasted=True)


def test_smooth_signal_fixed_predictors():
    t = np.arange(2000)
    smooth = (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)) \
        .astype(np.int16)
    for sf in ("fixed2", "fixed3", "fixed4", "lpc"):
        _rt(smooth, subframe=sf, partition_order=2)
    # compression sanity: fixed-predicted smooth audio beats verbatim
    sz_fixed = len(encode_flac(smooth, 8000, subframe="fixed2",
                               partition_order=2))
    sz_verb = len(encode_flac(smooth, 8000, subframe="verbatim"))
    assert sz_fixed < sz_verb


def test_extreme_samples():
    _rt(np.array([-32768, 32767, 0, -1, 1], np.int16))


def test_flac_equals_wav_on_same_pcm():
    # the audio_afp_pairs hash-unchanged contract: identical PCM through
    # either container decodes to identical samples
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32768, (520, 1), dtype=np.int16)
    via_wav, rw = decode_wav(encode_wav(pcm, 8000))
    via_flac, rf = decode_flac(encode_flac(pcm, 8000))
    assert rw == rf and (via_wav == via_flac).all()


def test_decode_audio_dispatcher():
    rng = np.random.default_rng(6)
    pcm = rng.integers(-32768, 32768, 300, dtype=np.int16)
    s1, _ = decode_audio(encode_wav(pcm, 8000))
    s2, _ = decode_audio(encode_flac(pcm, 8000))
    assert (s1 == s2).all()
    with pytest.raises(AudioDecodeError):
        decode_audio(b"\x00\x01\x02\x03" * 10)


def test_robustness_quarantine():
    rng = np.random.default_rng(7)
    buf = encode_flac(rng.integers(-32768, 32768, 800,
                                   dtype=np.int16), 8000)
    with pytest.raises(FlacDecodeError):
        decode_flac(b"fLaX" + buf[4:])
    with pytest.raises(FlacDecodeError):
        decode_flac(buf[: len(buf) // 2])  # truncated mid-frame
    corrupt = bytearray(buf)
    corrupt[-3] ^= 0x40  # flip a residual bit -> CRC-16 must catch
    with pytest.raises(FlacDecodeError):
        decode_flac(bytes(corrupt))
    hdr = bytearray(buf)
    # flip a bit inside the first frame header -> CRC-8 must catch
    first_frame = 4 + 4 + 34  # magic + block header + STREAMINFO
    hdr[first_frame + 2] ^= 0x01
    with pytest.raises(FlacDecodeError):
        decode_flac(bytes(hdr))
    with pytest.raises(FlacDecodeError):
        decode_flac(buf[:20])  # truncated metadata


def test_flac_mutation_fuzz_quarantine():
    # single-byte flips + truncations must raise AudioDecodeError
    # through the dispatcher (quarantine contract), never anything else
    rng = np.random.default_rng(99)
    pcm = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    buf = encode_flac(pcm, 8000, stereo_mode="mid_side",
                      subframe="lpc", partition_order=2)
    for i in range(400):
        b = bytearray(buf)
        if i % 3 == 0:
            b = b[: rng.integers(2, len(b))]
        else:
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        try:
            decode_audio(bytes(b))
        except AudioDecodeError:
            pass


def test_8bit_streams():
    rng = np.random.default_rng(8)
    pcm = rng.integers(-128, 128, (600, 2)).astype(np.int16)
    for sm in ("independent", "mid_side"):
        dec, r = decode_flac(encode_flac(pcm, 8000, bps=8,
                                         stereo_mode=sm))
        assert r == 8000 and (dec == pcm).all()
    with pytest.raises(ValueError):
        encode_flac(np.array([300], np.int16), 8000, bps=8)
    with pytest.raises(ValueError):
        encode_flac(np.array([1], np.int16), 8000, bps=12)


def test_hypothesis_roundtrip():
    # property gate: arbitrary PCM x arbitrary legal encoder params
    # round-trips exactly (hypothesis shrinks failures to tiny cases)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 700),
        ch=st.integers(1, 2),
        bs=st.sampled_from([64, 192, 256]),
        porder=st.integers(0, 3),
        sm=st.sampled_from(["independent", "left_side", "right_side",
                            "mid_side"]),
        sf=st.sampled_from(["auto", "verbatim", "fixed0", "fixed2",
                            "fixed4", "lpc"]),
        wasted=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def prop(n, ch, bs, porder, sm, sf, wasted, seed):
        if sm != "independent" and ch != 2:
            sm = "independent"
        rng = np.random.default_rng(seed)
        pcm = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
        dec, r = decode_flac(encode_flac(
            pcm, 8000, block_size=bs, stereo_mode=sm, subframe=sf,
            partition_order=porder, use_wasted=wasted))
        assert r == 8000 and dec.shape == pcm.shape
        assert (dec == pcm).all()

    prop()
