"""Keyless point-in-interval join (operators/intervaljoin.py) vs the
brute-force quadratic filter, plus the half-open boundary semantics and
the replication-factor guard."""

import datetime as dt

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.intervaljoin import (
    interval_overlap_join)

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return _EPOCH + dt.timedelta(seconds=float(s))


def _mk(spark, pts, ivs):
    p = spark.createDataFrame([(i, _ts(s)) for i, s in pts],
                              "pid long, pts timestamp_ntz")
    v = spark.createDataFrame([(i, _ts(a), _ts(b)) for i, a, b in ivs],
                              "iid long, s timestamp_ntz, e timestamp_ntz")
    return p, v


def _brute(pts, ivs):
    return {(pid, iid) for pid, s in pts for iid, a, b in ivs
            if a <= s < b}


def test_matches_brute_random(spark):
    rng = np.random.default_rng(11)
    pts = [(i, round(float(s), 3))
           for i, s in enumerate(rng.uniform(0, 5000, 300))]
    ivs = [(i, a, a + d) for i, (a, d) in enumerate(
        zip((round(float(x), 3) for x in rng.uniform(0, 5000, 60)),
            (round(float(x), 3) for x in rng.uniform(1, 400, 60))))]
    want = _brute(pts, ivs)
    p, v = _mk(spark, pts, ivs)
    for bucket_s in (50.0, 137.0, 1000.0):
        got = {(r["pid"], r["iid"]) for r in interval_overlap_join(
            p, v, "pts", "s", "e", bucket_s=bucket_s).collect()}
        assert got == want, f"bucket_s={bucket_s}"


def test_half_open_boundaries(spark):
    # start inclusive, end exclusive; interval end exactly on a bucket
    # edge must not leak into the next bucket
    pts = [(0, 100.0), (1, 200.0), (2, 199.999999)]
    ivs = [(7, 100.0, 200.0)]
    p, v = _mk(spark, pts, ivs)
    got = {(r["pid"], r["iid"]) for r in interval_overlap_join(
        p, v, "pts", "s", "e", bucket_s=100.0).collect()}
    assert got == {(0, 7), (2, 7)}


def test_empty_interval_matches_nothing(spark):
    p, v = _mk(spark, [(0, 50.0)], [(1, 50.0, 50.0)])
    assert interval_overlap_join(p, v, "pts", "s", "e",
                                 bucket_s=10.0).count() == 0


def test_no_duplicate_pairs_by_construction(spark):
    # one interval spanning many buckets, one point inside: exactly
    # one output row (points land in a single bucket)
    p, v = _mk(spark, [(0, 500.0)], [(1, 0.0, 1000.0)])
    rows = interval_overlap_join(p, v, "pts", "s", "e",
                                 bucket_s=10.0).collect()
    assert len(rows) == 1


def test_span_guard_raises(spark):
    p, v = _mk(spark, [(0, 5.0)], [(1, 0.0, 10_000.0)])
    with pytest.raises(ValueError, match="max_span_buckets"):
        interval_overlap_join(p, v, "pts", "s", "e", bucket_s=1.0,
                              max_span_buckets=100)
    # same data passes when validation is sized correctly
    assert interval_overlap_join(p, v, "pts", "s", "e",
                                 bucket_s=100.0).count() == 1


def test_column_collision_raises(spark):
    p, v = _mk(spark, [(0, 5.0)], [(1, 0.0, 10.0)])
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(p, v.withColumnRenamed("iid", "pid"),
                              "pts", "s", "e", bucket_s=10.0)
    with pytest.raises(ValueError, match="bucket_s"):
        interval_overlap_join(p, v, "pts", "s", "e", bucket_s=-1.0)
