"""Within-distance pair join (operators/distjoin.py) vs brute-force
haversine, with adversarial high-latitude and antimeridian clusters —
the regimes that break naive longitude bucketing."""

import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.distjoin import (
    _EARTH_R_KM, within_distance_pairs)


def _hav_km(a, b):
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2)
         * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * _EARTH_R_KM * math.asin(math.sqrt(h))


def _brute(pts, r):
    out = {}
    ids = sorted(pts)
    for i, p in enumerate(ids):
        for q in ids[i + 1:]:
            d = _hav_km(pts[p], pts[q])
            if d <= r:
                out[(p, q)] = round(d, 4)
    return out


def _run(spark, pts, r):
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in pts.items()],
        "id long, lat double, lng double")
    got = {(x.id_a, x.id_b): x.dist_km
           for x in within_distance_pairs(df, r).collect()}
    assert got == _brute(pts, r)
    return got


def test_random_global(spark):
    rng = np.random.default_rng(21)
    pts = {i: (float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-60, 60, 400), rng.uniform(-180, 180, 400)))}
    got = _run(spark, pts, 400.0)
    assert got, "fixture must produce pairs"


def test_high_latitude_clusters(spark):
    # tight clusters at lat 78-84 where lng degrees are ~7x shorter
    # than at the equator: naive fixed-pitch lng buckets split true
    # pairs here (the r2 IDW bug's regime)
    rng = np.random.default_rng(22)
    pts = {}
    i = 0
    for base_lat, base_lng in [(78.0, 10.0), (81.5, -150.0),
                               (84.0, 60.0)]:
        for _ in range(25):
            pts[i] = (base_lat + float(rng.uniform(-0.8, 0.8)),
                      base_lng + float(rng.uniform(-8, 8)))
            i += 1
    got = _run(spark, pts, 120.0)
    assert len(got) > 40


def test_antimeridian_pairs(spark):
    # pairs straddling +-180: dlng in raw degrees is ~359 but the true
    # distance is tiny — wrap copies must surface every pair
    rng = np.random.default_rng(23)
    pts = {}
    for i in range(30):
        lat = float(rng.uniform(-50, 50))
        pts[2 * i] = (lat, 179.0 + float(rng.uniform(0, 0.99)))
        pts[2 * i + 1] = (lat + float(rng.uniform(-0.3, 0.3)),
                          -180.0 + float(rng.uniform(0, 0.99)))
    got = _run(spark, pts, 200.0)
    straddle = [(a, b) for (a, b) in got
                if pts[a][1] > 0 and pts[b][1] < 0
                or pts[a][1] < 0 and pts[b][1] > 0]
    assert len(straddle) >= 20, "antimeridian pairs must be found"


def test_polar_band(spark):
    # points ringing the pole at lat 88-89.8: every lng bucket
    # degenerates to 360 degrees; all nearby pairs must still pair up
    rng = np.random.default_rng(24)
    pts = {i: (88.0 + float(rng.uniform(0, 1.8)),
               float(rng.uniform(-180, 180))) for i in range(40)}
    _run(spark, pts, 150.0)


def test_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "id long, lat double, lng double")
    with pytest.raises(ValueError):
        within_distance_pairs(df, 0.0)
