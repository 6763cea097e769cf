"""Streaming exact dedup (streaming/dedup.py): duplicates within the
watermark horizon are dropped across micro-batches; first occurrences
pass through exactly once; state survives a query restart via the
checkpoint."""

import os

import pandas as pd


def _pages(spark, rows):
    """rows: list of (url, ts, text)."""
    html = b"<html><body></body></html>"
    pdf = pd.DataFrame({
        "url": [r[0] for r in rows],
        "warc_ts": [pd.Timestamp(r[1]) for r in rows],
        "html": [html] * len(rows),
        "text": [r[2] for r in rows],
        "lang": ["en"] * len(rows)})
    from osc_geo_h3grid_srv_spark.sources.pages import PAGES_SCHEMA
    return spark.createDataFrame(pdf, PAGES_SCHEMA)


def _land(spark, landing, rows, name):
    import glob
    import shutil
    _pages(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def test_stream_dedup_across_batches_and_restart(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.streaming.dedup import stream_exact_dedup
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    seen = []

    def sink(bdf, bid):
        seen.extend((r["url"], r["text"]) for r in bdf.collect())

    def run():
        q = stream_exact_dedup(spark, landing, ckpt, sink,
                               watermark="1 hour")
        q.awaitTermination(300)

    # wave 1: A, B, and an intra-batch duplicate of A
    _land(spark, landing,
          [("u1", "2024-01-01 10:00", "doc A"),
           ("u2", "2024-01-01 10:01", "doc B"),
           ("u3", "2024-01-01 10:02", "doc A")], "w1")
    run()
    texts = sorted(t for _, t in seen)
    assert texts == ["doc A", "doc B"]
    # exactly one of u1/u3 survived (first-seen within the batch)
    urls_a = {u for u, t in seen if t == "doc A"}
    assert len(urls_a) == 1

    # wave 2 RESTARTS the query from the checkpoint: B again (dup,
    # within watermark -> dropped thanks to persisted state) + new C
    _land(spark, landing,
          [("u4", "2024-01-01 10:20", "doc B"),
           ("u5", "2024-01-01 10:21", "doc C")], "w2")
    run()
    texts = sorted(t for _, t in seen)
    assert texts == ["doc A", "doc B", "doc C"]
    assert ("u5", "doc C") in seen and ("u4", "doc B") not in seen
