"""Streaming perceptual image dedup (streaming/media_dedup.py): images
that LOOK the same (same picture under PGM/PNG containers) collapse to
one row across micro-batches; state survives a restart; undecodable
payloads quarantine through instead of aliasing out."""

import glob
import os
import shutil

import numpy as np
import pandas as pd


def _media(spark, rows):
    """rows: list of (doc_id, ts, payload_bytes)."""
    pdf = pd.DataFrame({
        "doc_id": [r[0] for r in rows],
        "media_type": ["image"] * len(rows),
        "width": [0] * len(rows), "height": [0] * len(rows),
        "n_frames": [1] * len(rows),
        "payload": [r[2] for r in rows],
        "ingest_ts": [pd.Timestamp(r[1]) for r in rows]})
    from osc_geo_h3grid_srv_spark.operators.multimodal import MEDIA_SCHEMA
    return spark.createDataFrame(pdf, MEDIA_SCHEMA
                                 + ", ingest_ts timestamp")


def _land(spark, landing, rows, name):
    _media(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def test_stream_image_dedup(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.functions.imagecodec import (
        encode_png, encode_ppm)
    from osc_geo_h3grid_srv_spark.streaming.media_dedup import (
        stream_image_dedup)
    rng = np.random.default_rng(9)
    img_a = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    img_b = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    seen = []

    def sink(df, _bid):
        seen.extend((r["doc_id"], r["dhash"] is None)
                    for r in df.collect())

    # batch 1: picture A as PGM and as PNG (same look, two containers)
    # + one corrupt payload
    _land(spark, landing, [
        (1, "2024-01-01 10:00", encode_ppm(img_a)),
        (2, "2024-01-01 10:01", encode_png(img_a, filter_type=2)),
        (3, "2024-01-01 10:02", b"not an image"),
    ], "b1")
    q = stream_image_dedup(spark, landing, ckpt, sink)
    q.awaitTermination(120)
    ids = {d for d, _ in seen}
    assert 3 in ids  # quarantine flows through
    assert len({1, 2} & ids) == 1  # one look -> one row
    # batch 2 after restart: A again (dropped via checkpointed state),
    # B new (kept), another corrupt payload (kept)
    n_before = len(seen)
    _land(spark, landing, [
        (4, "2024-01-01 10:10", encode_png(img_a, filter_type=0)),
        (5, "2024-01-01 10:11", encode_ppm(img_b)),
        (6, "2024-01-01 10:12", b"also garbage"),
    ], "b2")
    q2 = stream_image_dedup(spark, landing, ckpt, sink)
    q2.awaitTermination(120)
    new = seen[n_before:]
    new_ids = {d for d, _ in new}
    assert 4 not in new_ids  # same look as batch-1 A: deduped
    assert 5 in new_ids and 6 in new_ids
    assert any(isnull for d, isnull in new if d == 6)
