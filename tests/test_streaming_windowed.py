"""Watermarked event-time windows (streaming/windowed.py): tumbling
per-parent-cell anchor counts in append mode — a window is emitted
exactly once when the watermark passes its end, and pages later than
the watermark are DROPPED (bounded state)."""

import os

import pandas as pd
import pytest


def _pages(spark, stamps, lat=52.518, lng=13.405):
    """one page per timestamp, each with exactly one geo anchor."""
    html = (f'<html><body><span class="geo">{lat:.6f},{lng:.6f}</span>'
            "</body></html>").encode()
    pdf = pd.DataFrame({
        "url": [f"https://ex.org/{i}" for i in range(len(stamps))],
        "warc_ts": [pd.Timestamp(s) for s in stamps],
        "html": [html] * len(stamps),
        "text": [""] * len(stamps),
        "lang": ["en"] * len(stamps)})
    from osc_geo_h3grid_srv_spark.sources.pages import PAGES_SCHEMA
    return spark.createDataFrame(pdf, PAGES_SCHEMA)


def _land(spark, landing, stamps, name):
    import glob
    import shutil
    df = _pages(spark, stamps)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def test_windowed_counts_watermark_drops_late(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.streaming.windowed import (
        stream_windowed_cell_counts)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    appended = []

    def sink(bdf, bid):
        appended.extend(bdf.collect())

    def run():
        q = stream_windowed_cell_counts(
            spark, landing, ckpt, sink,
            window="10 minutes", watermark="15 minutes")
        q.awaitTermination(300)

    # wave 1: W1=[10:00,10:10) x5, W2=[10:10,10:20) x3, one page at
    # 11:00 advances the watermark to 10:45 (closes W1, W2)
    _land(spark, landing,
          ["2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02",
           "2024-01-01 10:03", "2024-01-01 10:04",
           "2024-01-01 10:12", "2024-01-01 10:13", "2024-01-01 10:14",
           "2024-01-01 11:00"], "w1")
    run()
    # wave 2: a LATE page at 10:05 (behind the 10:45 watermark ->
    # dropped), an in-time page at 10:47 (open window W5), and 11:30
    # (advances watermark to 11:15, closing W5 and the 11:00 window)
    _land(spark, landing,
          ["2024-01-01 10:05", "2024-01-01 10:47", "2024-01-01 11:30"],
          "w2")
    run()
    # wave 3: one fresh page just to run a batch that flushes anything
    # the previous run finalized
    _land(spark, landing, ["2024-01-01 12:30"], "w3")
    run()

    by_window = {}
    for r in appended:
        key = str(r["window_start"])[:16]
        assert key not in by_window, "window emitted twice"
        by_window[key] = r["n_anchors"]
    assert by_window["2024-01-01 10:00"] == 5  # late 10:05 page dropped
    assert by_window["2024-01-01 10:10"] == 3
    assert by_window["2024-01-01 10:40"] == 1  # in-time 10:47 page kept
    assert by_window["2024-01-01 11:00"] == 1
    # every emitted row carries the same (Berlin) parent cell
    assert len({r["parent"] for r in appended}) == 1
