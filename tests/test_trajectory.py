"""Trajectory analytics (operators/trajectory.py) vs hand-computed /
brute-force references, plus the nearest-neighbor join and Ripley's K
on the banded machinery (operators/distjoin.py, operators/ripley.py)."""

import datetime as dt
import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.distjoin import (
    _EARTH_R_KM, nearest_join, within_distance_pairs)
from osc_geo_h3grid_srv_spark.operators.ripley import ripleys_k
from osc_geo_h3grid_srv_spark.operators.trajectory import (
    grid_stay_points, od_flows, trajectory_stats)


def _hav(a, b):
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2)
         * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * _EARTH_R_KM * math.asin(math.sqrt(h))


def _ts(h, m=0, s=0, day=1):
    return dt.datetime(2024, 1, day, h, m, s)


def _pts_df(spark, rows):
    return spark.createDataFrame(
        rows, "entity_id long, seq long, ts timestamp, "
              "lat double, lng double")


# ---------------------------------------------------------------- stats

def test_trajectory_stats_two_entities(spark):
    track = [(52.5, 13.4), (52.6, 13.4), (52.6, 13.5), (52.5, 13.4)]
    rows = [(1, i, _ts(8 + i), la, lo)
            for i, (la, lo) in enumerate(track)]
    rows.append((2, 0, _ts(9), 48.1, 11.6))  # single point
    out = {r.entity_id: r for r in
           trajectory_stats(_pts_df(spark, rows)).collect()}
    path = sum(_hav(track[i], track[i + 1]) for i in range(3))
    disp = _hav(track[0], track[-1])  # returns to start -> 0
    assert out[1].n_points == 4
    assert out[1].path_km == pytest.approx(path, abs=1e-5)
    assert out[1].displacement_km == pytest.approx(disp, abs=1e-9)
    assert out[1].straightness == pytest.approx(0.0, abs=1e-9)
    assert out[2].n_points == 1
    assert out[2].path_km == 0.0
    assert out[2].straightness is None


def test_trajectory_stats_orders_by_ts_not_input(spark):
    # shuffled input order must not change the step decomposition
    track = [(10.0, 20.0), (10.5, 20.0), (11.0, 20.0)]
    rows = [(1, i, _ts(8 + i), la, lo)
            for i, (la, lo) in enumerate(track)]
    out1 = trajectory_stats(_pts_df(spark, rows)).collect()[0]
    out2 = trajectory_stats(_pts_df(spark, rows[::-1])).collect()[0]
    assert out1.path_km == out2.path_km
    assert out1.displacement_km == pytest.approx(out1.path_km, abs=1e-6)
    assert out1.straightness == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------- stay points

def test_stay_points_runs_and_thresholds(spark):
    # entity 1: 3 pts in cell A (40 min), 1 pt in B, 2 pts back in A
    rows = [
        (1, 0, _ts(8, 0), 50.01, 8.01),
        (1, 1, _ts(8, 20), 50.02, 8.02),
        (1, 2, _ts(8, 40), 50.03, 8.03),
        (1, 3, _ts(9, 0), 50.15, 8.01),   # different 0.1-cell
        (1, 4, _ts(9, 20), 50.04, 8.04),
        (1, 5, _ts(9, 30), 50.05, 8.05),
    ]
    out = grid_stay_points(_pts_df(spark, rows), cell_deg=0.1,
                           min_pts=3, min_dwell_s=600.0).collect()
    assert len(out) == 1  # the return visit has only 2 pts
    r = out[0]
    assert (r.gx, r.gy, r.n_pts) == (500, 80, 3)
    assert r.dwell_s == 2400.0
    # min_pts=2 also admits the 10-min return run if dwell allows
    out2 = grid_stay_points(_pts_df(spark, rows), cell_deg=0.1,
                            min_pts=2, min_dwell_s=600.0).collect()
    assert len(out2) == 2


def test_stay_points_validation(spark):
    df = _pts_df(spark, [(1, 0, _ts(8), 0.0, 0.0)])
    with pytest.raises(ValueError):
        grid_stay_points(df, cell_deg=0.0)
    with pytest.raises(ValueError):
        grid_stay_points(df, cell_deg=1.0, min_pts=0)


# ------------------------------------------------------------- od flows

def test_od_flows_day_endpoints(spark):
    rows = [
        # entity 1, day 1: A -> B
        (1, 0, _ts(8, day=1), 0.1, 0.1),
        (1, 1, _ts(12, day=1), 0.2, 0.2),
        (1, 2, _ts(18, day=1), 1.1, 1.1),
        # entity 1, day 2: stays in B (diagonal flow)
        (1, 3, _ts(9, day=2), 1.2, 1.2),
        # entity 2, day 1: A -> B too
        (2, 0, _ts(7, day=1), 0.3, 0.3),
        (2, 1, _ts(20, day=1), 1.3, 1.3),
    ]
    out = {(r.o_gx, r.o_gy, r.d_gx, r.d_gy): (r.n_trips, r.n_entities)
           for r in od_flows(_pts_df(spark, rows), cell_deg=1.0)
           .collect()}
    assert out[(0, 0, 1, 1)] == (2, 2)
    assert out[(1, 1, 1, 1)] == (1, 1)
    assert len(out) == 2


# --------------------------------------------------------- nearest join

def test_nearest_join_vs_brute(spark):
    rng = np.random.default_rng(7)
    probes = {i: (float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-80, 80, 60), rng.uniform(-180, 180, 60)))}
    anchors = {i: (float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-80, 80, 25), rng.uniform(-180, 180, 25)))}
    pdf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in probes.items()],
        "id long, lat double, lng double")
    adf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in anchors.items()],
        "id long, lat double, lng double")
    got = {(r.probe_id, r.rank): (r.anchor_id, r.dist_km)
           for r in nearest_join(pdf, adf, 3000.0, k=2).collect()}
    for p, pc in probes.items():
        cand = sorted((( _hav(pc, ac), a) for a, ac in anchors.items()
                       if _hav(pc, ac) <= 3000.0))
        for rank, (d, a) in enumerate(cand[:2], start=1):
            assert got[(p, rank)] == (a, round(d, 4))
        assert (p, len(cand[:2]) + 1) not in got


def test_nearest_join_antimeridian_and_k1(spark):
    probes = spark.createDataFrame(
        [(1, 10.0, 179.9)], "id long, lat double, lng double")
    anchors = spark.createDataFrame(
        [(11, 10.0, -179.8), (12, 10.0, 170.0)],
        "id long, lat double, lng double")
    out = nearest_join(probes, anchors, 500.0, k=1).collect()
    assert len(out) == 1 and out[0].anchor_id == 11
    with pytest.raises(ValueError):
        nearest_join(probes, anchors, 500.0, k=0)


# ------------------------------------------------------------ ripley K

def test_ripleys_k_vs_brute(spark):
    rng = np.random.default_rng(11)
    pts = {i: (float(la), float(lo)) for i, (la, lo) in enumerate(
        zip(rng.uniform(-50, 50, 80), rng.uniform(-40, 40, 80)))}
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in pts.items()],
        "id long, lat double, lng double")
    area = 1.0e8
    ds = [300.0, 800.0, 1500.0]
    out = {r.d_km: r for r in ripleys_k(df, ds, area).collect()}
    ids = sorted(pts)
    n = len(ids)
    for d in ds:
        cnt = sum(1 for i, p in enumerate(ids) for q in ids[i + 1:]
                  if round(_hav(pts[p], pts[q]), 4) <= d)
        assert out[d].n_pairs == cnt
        assert out[d].k_hat == pytest.approx(
            area * 2 * cnt / (n * (n - 1)), abs=1e-3)


def test_ripleys_k_zero_threshold_row_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 60.0, 120.0)],
        "id long, lat double, lng double")
    out = {r.d_km: r.n_pairs for r in
           ripleys_k(df, [10.0, 20.0], 1e6).collect()}
    assert out == {10.0: 0, 20.0: 0}  # empty thresholds still surface
    with pytest.raises(ValueError):
        ripleys_k(df, [], 1e6)
    with pytest.raises(ValueError):
        ripleys_k(df, [-1.0], 1e6)
    with pytest.raises(ValueError):
        ripleys_k(df, [1.0], 0.0)
