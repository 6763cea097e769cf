"""Streaming near-dup detection (streaming/near_dedup.py): LSH band
claims with keyed state; near-identical docs flag within AND across
micro-batches; distinct docs pass; state survives a query restart."""

import os

import pandas as pd

_LONG_A = ("the quick brown fox jumps over the lazy dog while the "
           "river runs slowly past the old mill and the miller waves")
# one word changed -> near-dup of A (high shingle Jaccard)
_LONG_B = _LONG_A.replace("slowly", "swiftly")
_LONG_C = ("completely different content about distributed systems "
           "and columnar storage engines with vectorized execution "
           "pipelines and adaptive query planning for modern hardware")
_LONG_D = _LONG_C.replace("modern", "future")


def _pages(spark, rows):
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


def test_stream_near_dedup(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.streaming.near_dedup import (
        stream_near_dedup)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    decisions = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            decisions[r["url"]] = (r["is_dup"], r["n_bands"],
                                   r["n_collisions"], r["max_est"])

    def run():
        q = stream_near_dedup(spark, landing, ckpt, sink,
                              threshold=0.7, watermark="1 hour")
        q.awaitTermination(300)

    # wave 1: A first, near-dup B later in the SAME batch, distinct C
    _land(spark, landing,
          [("a", "2024-01-01 10:00", _LONG_A),
           ("b", "2024-01-01 10:01", _LONG_B),
           ("c", "2024-01-01 10:02", _LONG_C)], "w1")
    run()
    assert decisions["a"][0] == 0 and decisions["a"][2] == 0
    assert decisions["c"][0] == 0 and decisions["c"][2] == 0
    assert decisions["b"][0] == 1          # flagged near-dup of a
    assert decisions["b"][3] >= 0.7        # signature-estimated overlap
    assert decisions["a"][1] == 8          # every band emitted

    # wave 2 RESTARTS from the checkpoint: near-dup D of C (cross-batch,
    # via persisted band claims) + genuinely new E
    _land(spark, landing,
          [("d", "2024-01-01 10:20", _LONG_D),
           ("e", "2024-01-01 10:21",
            "unrelated fresh text with entirely novel vocabulary "
            "spanning gardens orchards beekeeping and rural living")],
          "w2")
    run()
    assert decisions["d"][0] == 1 and decisions["d"][2] >= 1
    assert decisions["e"][0] == 0 and decisions["e"][2] == 0


def test_doc_decisions_threshold(spark):
    """batch-local reduce: collisions below the estimate threshold do
    NOT flag the doc (LSH false-positive bucket)."""
    from osc_geo_h3grid_srv_spark.streaming.near_dedup import (
        doc_decisions)
    from datetime import datetime
    ts = datetime(2024, 1, 1)
    rows = [("x", ts, 0, "o", 0, 0.3),
            ("x", ts, 1, "x", 1, 0.0),
            ("y", ts, 0, "o", 0, 0.9)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, band int, owner string, "
              "novel_band int, est double")
    out = {r["url"]: r for r in doc_decisions(df, 0.7).collect()}
    assert out["x"]["is_dup"] == 0 and out["x"]["n_collisions"] == 1
    assert out["y"]["is_dup"] == 1
