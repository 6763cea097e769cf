"""Pure-NumPy WAV audio codecs for the multimodal column family.

RIFF/WAVE is a fully public container (the classic Microsoft/IBM
multimedia file format): a "RIFF" header wrapping word-aligned chunks;
audio needs exactly the "fmt " chunk (format tag, channels, sample
rate, block align, bits per sample) and the "data" chunk (interleaved
samples). Decoded here with no external libraries:

* PCM16 — format tag 1, 16-bit little-endian (round 3),
* G.711 A-law / mu-law — format tags 6 / 7, 8-bit companded telephony
  audio per ITU-T G.711 (round 4): 256-entry expansion tables built
  from the published segment arithmetic (mu-law byte 0x00 -> -32124,
  A-law 0x55 -> -8 pin the table orientation).

FLAC (lossless, fully public: RFC 9639) decodes for real since round 5
via the sibling functions/flaccodec.py, dispatched from decode_audio by
magic bytes. Perceptual codecs (MP3/AAC) still need real
psychoacoustic transform stacks and raise AudioDecodeError, routing
payloads to the quarantine column.

Returns int16 arrays shaped (n_samples, n_channels).
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    pass


def _g711_tables():
    """(ulaw_table, alaw_table): byte -> linear int16, ITU-T G.711."""
    b = np.arange(256, dtype=np.int64)
    # mu-law: stored complemented; sign bit 0x80 = negative
    u = ~b & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    ulaw = np.where(u & 0x80, -mag, mag).astype(np.int16)
    # A-law: stored XOR 0x55; sign bit 0x80 = POSITIVE
    a = b ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    alaw = np.where(a & 0x80, mag, -mag).astype(np.int16)
    return ulaw, alaw


ULAW_TO_PCM, ALAW_TO_PCM = _g711_tables()


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """linear int16 -> mu-law byte (ITU-T G.711 segment compression):
    v = min(|x| + 132, 32767); segment = MSB(v) - 7 (v >= 132 so the
    MSB is in [7, 14]); mantissa = the 4 bits below the segment point;
    byte = NOT(sign | seg << 4 | mant). Exact inverse relationship with
    ULAW_TO_PCM is property-tested (decode(encode(x)) is the nearest
    segment level, within one quantization step)."""
    x = np.asarray(x, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    v = np.minimum(np.abs(x) + 0x84, 0x7FFF)
    seg = (np.floor(np.log2(v)) - 7).astype(np.int64)
    mant = (v >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """-> (samples int16 (n_samples, n_channels), sample_rate). Walks
    the chunk list (skipping LIST/fact/etc., honoring the RIFF even-byte
    padding rule); raises AudioDecodeError for anything but
    uncompressed PCM16 — including parse-level struct/numpy errors on
    corrupt chunk tables, so per-row quarantine handlers that catch
    AudioDecodeError can never be escaped by a dirty payload."""
    try:
        return _decode_wav_inner(buf)
    except AudioDecodeError:
        raise
    except (struct.error, ValueError, IndexError, OverflowError,
            MemoryError) as e:
        raise AudioDecodeError(
            f"wav: malformed payload: {type(e).__name__}: {e}") from e


def _decode_wav_inner(buf: bytes) -> tuple[np.ndarray, int]:
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise AudioDecodeError("wav: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        csize, = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + csize]
        if len(body) < csize:
            raise AudioDecodeError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if csize < 16:
                raise AudioDecodeError("wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if fmt is not None:
                break
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise AudioDecodeError("wav: missing fmt or data chunk")
    tag, n_ch, rate, _byte_rate, _block, bits = fmt
    if tag not in (1, 6, 7):
        raise AudioDecodeError(
            f"wav: format tag {tag} unsupported (PCM / G.711 only; "
            "perceptual codecs need real codec libraries)")
    if n_ch not in (1, 2):
        raise AudioDecodeError(f"wav: {n_ch} channels unsupported")
    if rate <= 0:
        raise AudioDecodeError(f"wav: bad sample rate {rate}")
    if tag == 1:
        if bits != 16:
            raise AudioDecodeError(f"wav: {bits}-bit unsupported (PCM16)")
        n_vals = len(data) // 2
        samples = np.frombuffer(data, dtype="<i2", count=max(n_vals, 0))
    else:
        if bits != 8:
            raise AudioDecodeError(
                f"wav: G.711 must be 8-bit, got {bits}")
        n_vals = len(data)
        table = ALAW_TO_PCM if tag == 6 else ULAW_TO_PCM
        samples = table[np.frombuffer(data, dtype=np.uint8)]
    if n_vals == 0 or n_vals % n_ch:
        raise AudioDecodeError(
            f"wav: data size {len(data)} not a whole number of "
            f"{n_ch}-channel frames")
    return samples.reshape(-1, n_ch).copy(), rate


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """sniff the container by magic bytes (RIFF/WAVE vs fLaC) and
    dispatch; AudioDecodeError for unknown or malformed payloads — the
    audio analogue of imagecodec.decode_image."""
    if buf[:4] == b"RIFF":
        return decode_wav(buf)
    if buf[:4] == b"fLaC":
        from .flaccodec import decode_flac
        return decode_flac(buf)
    raise AudioDecodeError(
        f"audio: unknown container magic {bytes(buf[:4])!r}")


def _wav_container(tag: int, n_ch: int, rate: int, bits: int,
                   body: bytes) -> bytes:
    """RIFF/WAVE assembly shared by every writer — chunk layout fixes
    (padding rules, extra chunks) happen in exactly one place."""
    block = n_ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * block, block,
                      bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 writer; samples (n,) mono or (n, ch)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"encode_wav: bad shape {s.shape}")
    return _wav_container(1, s.shape[1], rate, 16, s.tobytes())


def encode_wav_g711(codes: np.ndarray, rate: int, law: str) -> bytes:
    """G.711 writer from RAW companded bytes (the test/fixture source —
    byte-level, so the decode gate pins the expansion table itself,
    not a round trip through an encoder's rounding choices). codes:
    (n,) mono or (n, ch) uint8."""
    c = np.asarray(codes, dtype=np.uint8)
    if c.ndim == 1:
        c = c[:, None]
    if c.ndim != 2 or c.shape[1] not in (1, 2):
        raise ValueError(f"encode_wav_g711: bad shape {c.shape}")
    if law not in ("alaw", "ulaw"):
        raise ValueError(f"encode_wav_g711: law {law!r}")
    return _wav_container(6 if law == "alaw" else 7, c.shape[1], rate,
                          8, c.tobytes())
