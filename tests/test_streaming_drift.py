"""Streaming CUSUM drift alarm (streaming/drift.py): the recursion
advances within and across micro-batches, keyed state survives a
query restart via the checkpoint, late rows are dropped (order-
defined statistic), and ordered streaming output matches the batch
closed-form operator on the same data."""

import glob
import os
import shutil

import pandas as pd
import pytest


def _rows_df(spark, rows):
    """rows: (key, seq, ts_str, val, mu0)."""
    pdf = pd.DataFrame({
        "key": [r[0] for r in rows],
        "seq": [r[1] for r in rows],
        "ts": [pd.Timestamp(r[2]) for r in rows],
        "val": [r[3] for r in rows],
        "mu0": [r[4] for r in rows]})
    from osc_geo_h3grid_srv_spark.streaming.drift import IN_SCHEMA
    return spark.createDataFrame(pdf, IN_SCHEMA)


def _land(spark, landing, rows, name):
    _rows_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def _harness(spark, tmp_path, slack=1.0, threshold=5.0):
    from osc_geo_h3grid_srv_spark.streaming.drift import stream_cusum
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    seen = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            seen[(r["key"], r["seq"])] = (round(r["s"], 9), r["alarm"])

    def run():
        q = stream_cusum(spark, landing, ckpt, sink, slack, threshold)
        q.awaitTermination(300)

    return landing, seen, run


def test_cusum_within_and_across_batches(spark, tmp_path):
    landing, seen, run = _harness(spark, tmp_path)
    # mu0 = 10, slack 1: increments are val - 11
    _land(spark, landing, [
        ("a", 1, "2024-01-01 10:00", 13.0, 10.0),   # s = 2
        ("a", 2, "2024-01-01 10:01", 9.0, 10.0),    # s = 0 (clipped)
        ("a", 3, "2024-01-01 10:02", 15.0, 10.0),   # s = 4
    ], "w1")
    run()
    assert seen[("a", 1)] == (2.0, False)
    assert seen[("a", 2)] == (0.0, False)
    assert seen[("a", 3)] == (4.0, False)
    # batch 2 continues the recursion from checkpointed state
    _land(spark, landing, [
        ("a", 4, "2024-01-01 10:03", 14.0, 10.0),   # s = 7 -> alarm
        ("b", 1, "2024-01-01 10:03", 12.0, 10.0),   # fresh key, s = 1
    ], "w2")
    run()
    assert seen[("a", 4)] == (7.0, True)
    assert seen[("b", 1)] == (1.0, False)


def test_cusum_drops_late_rows_and_matches_batch(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.operators.tsstats import cusum
    landing, seen, run = _harness(spark, tmp_path, slack=0.5,
                                  threshold=3.0)
    rows1 = [("k", i, f"2024-01-01 10:{i:02d}", float(v), 5.0)
             for i, v in enumerate([7, 4, 6, 8], start=1)]
    _land(spark, landing, rows1, "w1")
    run()
    # a row OLDER than the last processed ts must be dropped
    _land(spark, landing, [
        ("k", 99, "2024-01-01 10:00", 100.0, 5.0),      # late -> drop
        ("k", 5, "2024-01-01 10:09", 9.0, 5.0),
    ], "w2")
    run()
    assert ("k", 99) not in seen
    # ordered part matches the batch closed-form operator exactly
    batch_rows = [("k", i, float(v))
                  for i, v in enumerate([7, 4, 6, 8, 9], start=1)]
    bdf = spark.createDataFrame(batch_rows,
                                "key string, ts long, val double")
    from pyspark.sql import functions as F
    bdf = bdf.withColumn("mu", F.lit(5.0))
    want = {r.ts: (r.s, r.alarm) for r in
            cusum(bdf, slack=0.5, threshold=3.0, key_col="key",
                  ts_col="ts", val_col="val", mu0_col="mu").collect()}
    got = {seq: seen[("k", seq)] for seq in (1, 2, 3, 4, 5)}
    for seq in got:
        assert got[seq][0] == pytest.approx(want[seq][0], abs=1e-9)
        assert got[seq][1] == want[seq][1]


def test_cusum_validates_threshold(spark):
    from osc_geo_h3grid_srv_spark.streaming.drift import make_cusum_fn
    with pytest.raises(ValueError):
        make_cusum_fn(1.0, 0.0)
