"""Streaming sitemap ingest (streaming/sitemap_seed.py): landed
payloads parse in-stream, canonical-url seeds dedup across
micro-batches and restarts, index files branch out, corrupt fetches
quarantine through."""

import glob
import os
import shutil

import pandas as pd

from osc_geo_h3grid_srv_spark.sources.sitemap import encode_sitemap
from osc_geo_h3grid_srv_spark.streaming.sitemap_seed import (
    stream_sitemap_seeds)


def _land(spark, landing, rows, name):
    pdf = pd.DataFrame({
        "sitemap_id": [r[0] for r in rows],
        "fetch_ts": [pd.Timestamp(r[1]) for r in rows],
        "payload": [r[2] for r in rows]})
    df = spark.createDataFrame(
        pdf, "sitemap_id long, fetch_ts timestamp, payload binary")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def test_stream_sitemap_seeds(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    seen = []

    def sink(df, _bid):
        seen.extend((r["kind"], r["canon"], r["sitemap_id"])
                    for r in df.collect())

    sm1 = encode_sitemap([
        {"loc": "https://a.example/p/1", "changefreq": "daily"},
        # tracking variant of the same page: collapses canonically
        {"loc": "https://a.example/p/1?utm_source=x"},
        {"loc": "https://a.example/p/2"},
    ])
    idx = encode_sitemap([{"loc": "https://a.example/child.xml"}],
                         index=True)
    _land(spark, landing, [
        (1, "2024-01-01 10:00", sm1),
        (2, "2024-01-01 10:01", idx),
        (3, "2024-01-01 10:02", b"<garbage"),
    ], "b1")
    q = stream_sitemap_seeds(spark, landing, ckpt, sink)
    q.awaitTermination(120)
    kinds = {}
    for k, c, s in seen:
        kinds.setdefault(k, []).append((c, s))
    seeds = {c for c, _ in kinds.get("seed", [])}
    assert seeds == {"https://a.example/p/1", "https://a.example/p/2"}
    assert [c for c, _ in kinds.get("index", [])] \
        == ["https://a.example/child.xml"]
    assert [s for _, s in kinds.get("quarantine", [])] == [3]
    # batch 2 after restart: p/1 re-declared by ANOTHER sitemap
    # (dropped via checkpointed canonical state), p/3 new, another
    # corrupt fetch (must pass through, not alias the first)
    n_before = len(seen)
    sm2 = encode_sitemap([
        {"loc": "https://a.example/p/1"},
        {"loc": "https://a.example/p/3"},
    ])
    _land(spark, landing, [
        (4, "2024-01-01 10:10", sm2),
        (5, "2024-01-01 10:11", b"<garbage too"),
    ], "b2")
    q2 = stream_sitemap_seeds(spark, landing, ckpt, sink)
    q2.awaitTermination(120)
    new = seen[n_before:]
    new_seeds = {c for k, c, _ in new if k == "seed"}
    assert new_seeds == {"https://a.example/p/3"}
    assert [s for k, _, s in new if k == "quarantine"] == [5]
