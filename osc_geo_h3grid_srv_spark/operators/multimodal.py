"""Multimodal column handling: image/audio/video as opaque `binary`
columns with typed metadata.

The image/audio decode libraries are not present in this environment, so
the DECODE step is a clearly-marked deterministic STUB - but all the
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
mapInPandas signatures, partitioning by media type, and the feature
pipeline (binary -> fixed-dim float vector) that feeds the similarity
operators.

Swap `_decode_image_stub` for a real PIL/libvips call on a cluster with
the libs installed; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import mix64

MEDIA_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                "n_frames int, payload binary")

FEATURE_DIM = 32


def synth_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """deterministic fake media table: payload bytes derive from doc_id."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            h = mix64(ids)
            mt = np.array(["image", "audio", "video"], dtype=object)[
                (h % np.uint64(3)).astype(np.int64)]
            w = (64 + (h % np.uint64(512))).astype(np.int32)
            ht = (64 + ((h >> np.uint64(9)) % np.uint64(512))).astype(np.int32)
            nf = np.where(mt == "video",
                          (1 + (h % np.uint64(120))).astype(np.int32), 1)
            payload = [mix64(np.arange(int(i) % 97 + 16, dtype=np.uint64)
                             + np.uint64(i)).tobytes() for i in ids]
            yield pd.DataFrame({
                "doc_id": ids.astype(np.int64), "media_type": mt,
                "width": w, "height": ht, "n_frames": nf,
                "payload": payload})

    return spark.range(0, n_rows, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real implementation would be PIL.Image.open(BytesIO(...)).
    Deterministic fake: tile the payload bytes to (height, width)."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = need // len(raw) + 1
    return np.tile(raw, reps)[:need].reshape(height, width)


def synth_image_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """deterministic media table whose image payloads are REAL image
    files (functions/imagecodec.py): mix64-derived RGB rasters wrapped
    as PPM (P6), except every third row which carries the SAME pixels
    in a PNG container (filter cycling over the row index so all five
    unfilter paths run). The decoded stats are container-independent,
    so the oracle replay of the generation recipe gates BOTH parsers
    without knowing which container each row used."""
    from ..functions.imagecodec import encode_png

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy(dtype=np.int64):
                u = np.uint64(i)
                h0 = int(mix64(np.array([u], dtype=np.uint64))[0])
                w = 4 + (h0 % 13)
                ht = 4 + ((h0 >> 9) % 11)
                npx = w * ht * 3
                nwords = (npx + 7) // 8
                words = mix64(np.arange(nwords, dtype=np.uint64) + u)
                px = np.frombuffer(words.tobytes(), np.uint8)[:npx]
                if i % 3 == 2:
                    payload = encode_png(px.reshape(ht, w, 3),
                                         filter_type=int(i) % 5)
                else:
                    payload = (b"P6\n%d %d\n255\n" % (w, ht)) \
                        + px.tobytes()
                rows.append((int(i), "image", w, ht, 1, payload))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "width", "height", "n_frames",
                "payload"])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL decode (BMP/PPM/PGM, functions/imagecodec.py) -> per-image
    pixel statistics. Undecodable payloads land in an error column
    instead of failing the job (the quarantine pattern for dirty
    lake data)."""
    from ..functions.imagecodec import ImageDecodeError, decode_image
    schema = ("doc_id long, width int, height int, channels int, "
              "px_sum long, px_min int, px_max int, n_px long, "
              "error string")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    rows.append((int(did), img.shape[1], img.shape[0],
                                 ch, int(img.sum(dtype=np.int64)),
                                 int(img.min()), int(img.max()),
                                 int(img.size), None))
                except ImageDecodeError as e:
                    rows.append((int(did), None, None, None, None, None,
                                 None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "channels", "px_sum",
                "px_min", "px_max", "n_px", "error"])

    return media.mapInPandas(gen, schema=schema)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """binary payload -> fixed-dim float feature vector via mapInPandas.

    The feature computation is a deterministic stand-in (byte-histogram
    projection); the Arrow batch shape, schema, and the downstream
    contract (array<double> consumable by similarity ops) are the real
    deliverable."""
    schema = "doc_id long, media_type string, features array<double>"

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(raw % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_type": pdf["media_type"],
                                "features": feats})

    return media.mapInPandas(gen, schema=schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video frame sampling plan: one output row per sampled frame index.
    Frame DECODE is stubbed (no codecs here); the explode/partition
    plumbing is real."""
    v = media.filter(F.col("media_type") == "video")
    return v.select(
        "doc_id", "width", "height",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"))


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """image resize pipeline: decodes via the stub, nearest-neighbor
    resamples, re-encodes as raw bytes. Real kernel = PIL/cv2; the
    mapInPandas batch path is identical."""
    schema = "doc_id long, width int, height int, payload binary"

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = _decode_image_stub(bytes(r["payload"]),
                                         int(r["width"]), int(r["height"]))
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                rows.append(img[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "width": out_w, "height": out_h,
                                "payload": rows})

    return (media.filter(F.col("media_type") == "image")
            .mapInPandas(gen, schema=schema))


def synth_audio_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """deterministic media table whose audio payloads are REAL PCM16 WAV
    files (functions/audiocodec.py): RIFF/fmt/data chunks wrapping
    mix64-derived interleaved int16 samples. Sample count, channel
    count, and rate all derive from the doc id, so the decoded stats
    are oracle-replayable from the recipe — a chunk-walk or
    sign/byte-order bug in the decoder cannot hide."""
    from ..functions.audiocodec import encode_wav

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy(dtype=np.int64):
                u = np.uint64(i)
                h0 = int(mix64(np.array([u], dtype=np.uint64))[0])
                ns = 50 + h0 % 200
                ch = 1 + (h0 >> 9) % 2
                rate = 8000 * (1 + (h0 >> 17) % 2)
                nvals = ns * ch
                nw = (nvals + 3) // 4
                words = mix64(np.arange(nw, dtype=np.uint64)
                              + u * np.uint64(1000003))
                vals = np.frombuffer(words.tobytes(), "<i2")[:nvals]
                payload = encode_wav(vals.reshape(ns, ch), rate)
                rows.append((int(i), "audio", 0, 0, 1, payload))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "width", "height", "n_frames",
                "payload"])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> per-clip sample statistics; undecodable
    payloads land in the error column (quarantine pattern), never fail
    the job."""
    from ..functions.audiocodec import AudioDecodeError, decode_wav
    schema = ("doc_id long, n_samples long, n_channels int, "
              "sample_rate int, s_sum long, s_min int, s_max int, "
              "n_vals long, error string")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    s, rate = decode_wav(bytes(payload))
                    rows.append((int(did), s.shape[0], s.shape[1],
                                 int(rate), int(s.sum(dtype=np.int64)),
                                 int(s.min()), int(s.max()),
                                 int(s.size), None))
                except AudioDecodeError as e:
                    rows.append((int(did), None, None, None, None,
                                 None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "n_channels", "sample_rate",
                "s_sum", "s_min", "s_max", "n_vals", "error"])

    return media.mapInPandas(gen, schema=schema)
