"""Per-key resample + linear gap-fill (operators/resample.py) vs a
brute-force python reference, simple and bucketed plans."""

import datetime as dt
import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.resample import (
    resample_interpolate)

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return _EPOCH + dt.timedelta(seconds=float(s))


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in rows],
        "k long, ts timestamp_ntz, val double")


_BASE = (_EPOCH - dt.datetime(1970, 1, 1)).total_seconds()


def _brute(rows, step_s):
    # the grid is EPOCH-aligned (multiples of step_s in unix time,
    # exactly what DuckDB's epoch_us replay produces), so the brute
    # reference works in absolute seconds and shifts back
    out = {}
    bykey = {}
    for k, s, v in rows:
        bykey.setdefault(k, []).append((_BASE + s, v))
    for k, obs in bykey.items():
        obs.sort()
        lo = math.ceil(obs[0][0] / step_s)
        hi = math.floor(obs[-1][0] / step_s)
        for gi in range(lo, hi + 1):
            g = gi * step_s
            prev = max((o for o in obs if o[0] <= g),
                       key=lambda o: o[0])
            nxt = min((o for o in obs if o[0] >= g),
                      key=lambda o: o[0])
            if prev[0] == nxt[0]:
                val = prev[1]
            else:
                val = prev[1] + (nxt[1] - prev[1]) * (
                    (g - prev[0]) / (nxt[0] - prev[0]))
            out[(k, g - _BASE)] = val
    return out


def _collect(df):
    return {(r["k"], (r["grid_ts"] - _EPOCH).total_seconds()): r["val"]
            for r in df.collect()}


def test_matches_brute_random(spark):
    rng = np.random.default_rng(19)
    rows, seen = [], set()
    for k, s in zip(rng.integers(0, 5, 150), rng.uniform(0, 9000, 150)):
        key = (int(k), round(float(s), 2))
        if key not in seen:
            seen.add(key)
            rows.append((key[0], key[1],
                         round(float(rng.uniform(-10, 10)), 3)))
    df = _mk(spark, rows)
    want = _brute(rows, 500.0)
    for bucket_s in (None, 750.0):
        got = _collect(resample_interpolate(
            df, "k", "ts", "val", 500.0, bucket_s=bucket_s))
        assert set(got) == set(want), f"bucket_s={bucket_s}"
        for key in want:
            assert abs(got[key] - want[key]) < 5e-7, (key, bucket_s)


def test_exact_hits_pass_through(spark):
    rows = [(1, 0.0, 5.0), (1, 100.0, 9.0), (1, 250.0, 1.0)]
    got = _collect(resample_interpolate(_mk(spark, rows),
                                        "k", "ts", "val", 100.0))
    assert got[(1, 0.0)] == 5.0
    assert got[(1, 100.0)] == 9.0
    assert got[(1, 200.0)] == pytest.approx(9.0 + (1.0 - 9.0) * 100 / 150)


def test_span_without_grid_multiple_emits_nothing(spark):
    rows = [(1, 101.0, 5.0), (1, 150.0, 9.0)]
    assert resample_interpolate(_mk(spark, rows), "k", "ts", "val",
                                200.0).count() == 0


def test_single_obs_on_grid_point(spark):
    rows = [(1, 300.0, 7.0)]
    got = _collect(resample_interpolate(_mk(spark, rows),
                                        "k", "ts", "val", 100.0))
    assert got == {(1, 300.0): 7.0}


def test_null_rows_dropped_and_guards(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, None, 9.0), (1, _ts(100), None),
         (1, _ts(200), 3.0)],
        "k long, ts timestamp_ntz, val double")
    got = _collect(resample_interpolate(df, "k", "ts", "val", 100.0))
    assert got[(1, 100.0)] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="step_s"):
        resample_interpolate(df, "k", "ts", "val", 0.0)
    with pytest.raises(ValueError, match="max_grid_points"):
        resample_interpolate(df, "k", "ts", "val", 0.001,
                             max_grid_points=1000)
