"""Pure-NumPy WAV/PCM16 audio codec for the multimodal column family.

RIFF/WAVE is a fully public container (the classic Microsoft/IBM
multimedia file format): a "RIFF" header wrapping word-aligned chunks;
audio needs exactly the "fmt " chunk (format tag, channels, sample
rate, block align, bits per sample) and the "data" chunk (interleaved
little-endian samples). PCM16 (format tag 1, 16-bit) mono/stereo is
decoded here with no external libraries — the second end-to-end REAL
decode path in the container (images: imagecodec.py). Compressed
formats (MP3/AAC/FLAC) need real codec libraries and raise
AudioDecodeError, routing payloads to the quarantine column.

Returns int16 arrays shaped (n_samples, n_channels).
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    pass


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """-> (samples int16 (n_samples, n_channels), sample_rate). Walks
    the chunk list (skipping LIST/fact/etc., honoring the RIFF even-byte
    padding rule); raises AudioDecodeError for anything but
    uncompressed PCM16."""
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
    if tag != 1:
        raise AudioDecodeError(
            f"wav: format tag {tag} unsupported (PCM only; compressed "
            "audio needs real codec libraries)")
    if bits != 16:
        raise AudioDecodeError(f"wav: {bits}-bit unsupported (PCM16)")
    if n_ch not in (1, 2):
        raise AudioDecodeError(f"wav: {n_ch} channels unsupported")
    if rate <= 0:
        raise AudioDecodeError(f"wav: bad sample rate {rate}")
    n_vals = len(data) // 2
    if n_vals == 0 or n_vals % n_ch:
        raise AudioDecodeError(
            f"wav: data size {len(data)} not a whole number of "
            f"{n_ch}-channel frames")
    samples = np.frombuffer(data, dtype="<i2", count=n_vals)
    return samples.reshape(-1, n_ch).copy(), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 writer; samples (n,) mono or (n, ch)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"encode_wav: bad shape {s.shape}")
    n_ch = s.shape[1]
    body = s.tobytes()
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
