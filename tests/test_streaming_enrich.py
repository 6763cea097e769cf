"""Streaming as-of enrichment (streaming/enrich.py): probes pick up
the newest at-or-before snapshot within and across micro-batches;
keyed state survives a query restart via the checkpoint; output
matches the batch asof_join on the same data when nothing arrives
late."""

import glob
import os
import shutil

import pandas as pd


def _rows_df(spark, rows):
    """rows: (event_id, user_id, ts_str, side, value)."""
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "ts": [pd.Timestamp(r[2]) for r in rows],
        "side": [r[3] for r in rows],
        "value": [r[4] for r in rows]})
    from osc_geo_h3grid_srv_spark.streaming.enrich import IN_SCHEMA
    return spark.createDataFrame(pdf, IN_SCHEMA)


def _land(spark, landing, rows, name):
    _rows_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def _harness(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.streaming.enrich import (
        stream_asof_enrich)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    seen = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            seen[r["event_id"]] = (
                r["snap_value"],
                None if r["asof_ts"] is None else str(r["asof_ts"]))

    def run():
        q = stream_asof_enrich(spark, landing, ckpt, sink)
        q.awaitTermination(300)

    return landing, seen, run


def test_enrich_within_and_across_batches(spark, tmp_path):
    landing, seen, run = _harness(spark, tmp_path)
    # batch 1: user 1 snapshot at 10:00, probes straddling it; user 2
    # probe with no snapshot at all
    _land(spark, landing, [
        (1, 1, "2024-01-01 09:59", 1, None),   # before any snapshot
        (2, 1, "2024-01-01 10:00", 1, None),   # AT the snapshot ts
        (3, 1, "2024-01-01 10:05", 1, None),
        (90, 1, "2024-01-01 10:00", 0, 7.0),
        (4, 2, "2024-01-01 10:00", 1, None),
    ], "w1")
    run()
    assert seen[1] == (None, None)
    assert seen[2] == (7.0, "2024-01-01 10:00:00")
    assert seen[3] == (7.0, "2024-01-01 10:00:00")
    assert seen[4] == (None, None)

    # batch 2 (restart, same checkpoint): user 1's state carries; a
    # newer snapshot supersedes; an OLDER snapshot is ignored
    _land(spark, landing, [
        (5, 1, "2024-01-01 11:00", 1, None),   # carried 10:00 state
        (91, 1, "2024-01-01 11:30", 0, 9.0),
        (92, 1, "2024-01-01 11:10", 0, 5.0),   # older within batch
        (6, 1, "2024-01-01 11:40", 1, None),   # newest (11:30) wins
        (7, 2, "2024-01-01 11:00", 1, None),   # user 2 still bare
    ], "w2")
    run()
    assert seen[5] == (7.0, "2024-01-01 10:00:00")
    assert seen[6] == (9.0, "2024-01-01 11:30:00")
    assert seen[7] == (None, None)
    # stale cross-batch snapshot does not rewind state
    _land(spark, landing, [
        (93, 1, "2024-01-01 10:30", 0, 1.0),
        (8, 1, "2024-01-01 12:00", 1, None),
    ], "w3")
    run()
    assert seen[8] == (9.0, "2024-01-01 11:30:00")


def test_enrich_matches_batch_asof_join(spark, tmp_path):
    import numpy as np
    from osc_geo_h3grid_srv_spark.operators.asof import asof_join
    landing, seen, run = _harness(spark, tmp_path)
    rng = np.random.default_rng(23)
    rows, eid = [], 0
    snap_seen = set()
    for k, s in zip(rng.integers(0, 4, 60), rng.integers(0, 5000, 60)):
        side = int(rng.integers(0, 2))
        key = (int(k), int(s))
        if side == 0 and key in snap_seen:
            continue  # snapshot uniqueness per (key, ts)
        if side == 0:
            snap_seen.add(key)
        eid += 1
        ts = str(pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=key[1]))
        rows.append((eid, key[0], ts,
                     side, float(key[1]) if side == 0 else None))
    _land(spark, landing, rows, "w1")
    run()

    df = _rows_df(spark, rows)
    probes = (df.filter("side = 1")
              .select("event_id", "user_id", "ts"))
    snaps = (df.filter("side = 0")
             .select("user_id", "ts", "value"))
    want = {r["event_id"]: (r["value"],
                            None if r["asof_ts"] is None
                            else str(r["asof_ts"]))
            for r in asof_join(probes, snaps, "user_id", "ts", "ts",
                               ["value"]).collect()}
    assert seen == want
