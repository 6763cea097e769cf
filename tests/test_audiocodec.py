"""WAV/PCM16 codec: round-trips, RIFF chunk walking, and quarantine
(AudioDecodeError) for everything malformed or compressed."""

import struct

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions.audiocodec import (
    AudioDecodeError, decode_wav, encode_wav)


def test_roundtrip_mono():
    s = (np.arange(100, dtype=np.int16) * 317 - 15000).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and out.shape == (100, 1)
    assert (out[:, 0] == s).all()


def test_roundtrip_stereo():
    s = np.stack([np.arange(64, dtype=np.int16),
                  -np.arange(64, dtype=np.int16)], axis=1)
    out, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and out.shape == (64, 2)
    assert (out == s).all()


def test_negative_samples_sign_extend():
    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    out, _ = decode_wav(encode_wav(s, 8000))
    assert out[:, 0].tolist() == [-32768, -1, 0, 1, 32767]


def test_chunk_walk_skips_list_chunk():
    # insert a LIST chunk (odd size -> tests the even-padding rule)
    # between fmt and data
    s = np.array([5, -5, 7], dtype=np.int16)
    buf = encode_wav(s, 8000)
    fmt_chunk = buf[12:12 + 8 + 16]
    data_chunk = buf[12 + 8 + 16:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    body = fmt_chunk + extra + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav(rebuilt)
    assert rate == 8000 and out[:, 0].tolist() == [5, -5, 7]


def test_data_before_fmt_still_decodes():
    s = np.array([1, 2], dtype=np.int16)
    buf = encode_wav(s, 8000)
    fmt_chunk = buf[12:12 + 8 + 16]
    data_chunk = buf[12 + 8 + 16:]
    body = data_chunk + fmt_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, _ = decode_wav(rebuilt)
    assert out[:, 0].tolist() == [1, 2]


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b"JUNK" + b[4:], "RIFF"),
    (lambda b: b[:40], "truncated|missing"),
    # format tag 85 = MP3 -> compressed, quarantined
    (lambda b: b[:20] + struct.pack("<H", 85) + b[22:], "format tag"),
    # 8-bit sample width
    (lambda b: b[:34] + struct.pack("<H", 8) + b[36:], "16"),
    # chop one byte off data -> not a whole number of frames
    (lambda b: b[:-1] + b"", "whole number|truncated"),
])
def test_malformed_quarantine(mutate, msg):
    s = np.array([3, -3, 9], dtype=np.int16)
    buf = encode_wav(s, 8000)
    with pytest.raises(AudioDecodeError, match=msg):
        decode_wav(mutate(buf))


def test_spark_decode_audio_stats(spark):
    from osc_geo_h3grid_srv_spark.operators.multimodal import (
        decode_audio_stats, synth_audio_media)
    media = synth_audio_media(spark, 40, partitions=4)
    rows = {r["doc_id"]: r for r in decode_audio_stats(media).collect()}
    assert len(rows) == 40 and all(
        r["error"] is None for r in rows.values())
    # replay one clip driver-side through the same recipe
    from osc_geo_h3grid_srv_spark.functions.text import mix64
    i = 7
    h0 = int(mix64(np.array([i], dtype=np.uint64))[0])
    ns, ch = 50 + h0 % 200, 1 + (h0 >> 9) % 2
    nvals = ns * ch
    nw = (nvals + 3) // 4
    words = mix64(np.arange(nw, dtype=np.uint64)
                  + np.uint64(i) * np.uint64(1000003))
    vals = np.frombuffer(words.tobytes(), "<i2")[:nvals].astype(np.int64)
    r = rows[i]
    assert (r["n_samples"], r["n_channels"]) == (ns, ch)
    assert r["sample_rate"] == 8000 * (1 + (h0 >> 17) % 2)
    assert r["s_sum"] == int(vals.sum())
    assert (r["s_min"], r["s_max"]) == (int(vals.min()), int(vals.max()))


def test_g711_table_pins():
    # published ITU-T G.711 decode-table anchors: a wrong complement/
    # XOR/sign orientation or segment shift breaks at least one
    from osc_geo_h3grid_srv_spark.functions.audiocodec import (
        ALAW_TO_PCM, ULAW_TO_PCM)
    assert int(ULAW_TO_PCM[0x00]) == -32124
    assert int(ULAW_TO_PCM[0x80]) == 32124
    assert int(ULAW_TO_PCM[0xFF]) == 0
    assert int(ULAW_TO_PCM[0x7F]) == -0  # negative zero -> 0
    assert int(ALAW_TO_PCM[0x55]) == -8
    assert int(ALAW_TO_PCM[0xD5]) == 8
    assert int(ALAW_TO_PCM[0x2A]) == -32256  # negative full scale
    assert int(ALAW_TO_PCM[0xAA]) == 32256
    assert int(ALAW_TO_PCM[0x45]) == -264    # segment-1 floor
    # both tables are odd-symmetric under the sign bit
    import numpy as np
    u = ULAW_TO_PCM.astype(np.int64)
    assert (u[:128] == -u[128:]).all()
    a = ALAW_TO_PCM.astype(np.int64)
    assert (a[0x80:] == -a[:0x80]).all()


def test_g711_wav_roundtrip():
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.audiocodec import (
        ALAW_TO_PCM, ULAW_TO_PCM, decode_wav, encode_wav_g711)
    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", ULAW_TO_PCM), ("alaw", ALAW_TO_PCM)):
        s, rate = decode_wav(encode_wav_g711(codes, 8000, law))
        assert rate == 8000 and s.shape == (256, 1)
        assert (s[:, 0] == table).all()
        # stereo interleave
        st = np.stack([codes[:10], codes[10:20]], axis=1)
        s2, _ = decode_wav(encode_wav_g711(st, 8000, law))
        assert s2.shape == (10, 2)
        assert (s2[:, 0] == table[codes[:10]]).all()
        assert (s2[:, 1] == table[codes[10:20]]).all()


def test_g711_bad_bits_quarantine():
    import struct
    import pytest
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.audiocodec import (
        AudioDecodeError, decode_wav, encode_wav_g711)
    buf = bytearray(encode_wav_g711(np.zeros(8, np.uint8), 8000, "ulaw"))
    i = buf.find(b"fmt ") + 8 + 14  # bits-per-sample field
    struct.pack_into("<H", buf, i, 16)
    with pytest.raises(AudioDecodeError, match="8-bit"):
        decode_wav(bytes(buf))


def test_ulaw_encode_decode_inverse():
    import numpy as np
    from osc_geo_h3grid_srv_spark.functions.audiocodec import (
        ULAW_TO_PCM, ulaw_encode)
    x = np.arange(-32768, 32768, dtype=np.int64)
    dec = ULAW_TO_PCM[ulaw_encode(x)].astype(np.int64)
    # within one top-segment quantization step everywhere
    assert np.abs(dec - x).max() <= 644
    # encode is a left inverse of the decode table, except negative
    # zero (0x7F) which canonicalizes to positive zero (0xFF) — the
    # standard G.711 -0 -> +0 collapse
    b = np.arange(256, dtype=np.int64)
    rt = ulaw_encode(ULAW_TO_PCM[b].astype(np.int64))
    mism = np.nonzero(rt != b)[0]
    assert list(mism) == [0x7F] and rt[0x7F] == 0xFF


def test_afp_triples(spark):
    # acoustic dedup: PCM16 / halved / mu-law-transcoded copies of one
    # clip fingerprint within small hamming; banding returns exactly
    # the brute-force pair set
    import itertools
    import numpy as np
    from osc_geo_h3grid_srv_spark.operators import multimodal
    from osc_geo_h3grid_srv_spark.operators.dedup import hamming_pairs
    media = multimodal.synth_afp_media(spark, 90, partitions=4)
    fps = multimodal.afp_audio(media)
    pdf = fps.toPandas()
    assert pdf["error"].isna().all()
    by_id = dict(zip(pdf["doc_id"], pdf["afp"]))

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    hams01 = [ham(by_id[3 * g], by_id[3 * g + 1]) for g in range(30)]
    hams02 = [ham(by_id[3 * g], by_id[3 * g + 2]) for g in range(30)]
    assert all(h <= 6 for h in hams01 + hams02)  # near-dups
    pairs = hamming_pairs(fps, "doc_id", "afp", max_hamming=3,
                          salt=2).toPandas()
    brute = {(a, b) for a, b in itertools.combinations(sorted(by_id), 2)
             if ham(by_id[a], by_id[b]) <= 3}
    got = {(r["id_a"], r["id_b"]) for _, r in pairs.iterrows()}
    assert got == brute


def test_decode_wav_mutation_fuzz():
    """every single-byte mutation / truncation of a real WAV either
    decodes or raises AudioDecodeError — parse-level struct/numpy
    errors must never escape the quarantine contract."""
    from osc_geo_h3grid_srv_spark.functions.audiocodec import (
        encode_wav_g711)
    rs0 = np.random.RandomState(7)
    pcm = encode_wav(
        rs0.randint(-3000, 3000, (64, 2)).astype(np.int16), 8000)
    g711 = encode_wav_g711(
        rs0.randint(0, 256, 80).astype(np.uint8), 8000, "ulaw")
    for good in (pcm, g711):
        rs = np.random.RandomState(len(good))
        for _ in range(400):
            pos = int(rs.randint(0, len(good)))
            bad = (good[:pos] + bytes([int(rs.randint(0, 256))])
                   + good[pos + 1:])
            try:
                decode_wav(bad)
            except AudioDecodeError:
                pass
        for cut in range(0, len(good), 4):
            try:
                decode_wav(good[:cut])
            except AudioDecodeError:
                pass
