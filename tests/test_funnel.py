"""Funnel + cohort analytics (operators/funnel.py) on hand-built
event fixtures with known conversions, plus LISA consistency."""

import datetime as dt

import pytest

from osc_geo_h3grid_srv_spark.operators.funnel import (
    cohort_retention, funnel_conversion)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order(spark):
    rows = [
        # u1 full funnel in order
        (1, 1, 9, "view"), (1, 1, 10, "click"), (1, 1, 11, "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, 2, 9, "click"), (2, 2, 10, "view"),
        # u3 views then purchases with no click: stops at step 1
        (3, 3, 9, "view"), (3, 3, 10, "purchase"),
        # u4 never views: not in the funnel at all
        (4, 4, 9, "click"), (4, 4, 10, "purchase"),
        # u5 full funnel, events interleaved with repeats
        (5, 5, 9, "view"), (5, 5, 10, "view"), (5, 5, 11, "click"),
        (5, 5, 12, "click"), (5, 5, 13, "purchase"),
    ]
    got = {r.step: (r.event_type, r.n_users, r.pct_of_step1)
           for r in funnel_conversion(
               _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert got[1] == ("view", 4, 1.0)        # u1 u2 u3 u5
    assert got[2] == ("click", 2, 0.5)       # u1 u5
    assert got[3] == ("purchase", 2, 0.5)    # u1 u5


def test_funnel_equal_ts_not_counted(spark):
    # strict ordering: a click at EXACTLY the view time does not count
    rows = [(1, 1, 9, "view"), (1, 1, 9, "click")]
    got = {r.step: r.n_users for r in funnel_conversion(
        _ev(spark, rows), ["view", "click"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_validation(spark):
    ev = _ev(spark, [(1, 1, 9, "view")])
    with pytest.raises(ValueError):
        funnel_conversion(ev, ["view"])
    with pytest.raises(ValueError):
        funnel_conversion(ev, ["view", "view"])


def test_cohort_retention_triangle(spark):
    # u1 first week W1, active W1+W2; u2 first W1 only; u3 first W2
    rows = [
        (1, 1, 9, "view"), (1, 10, 9, "click"),   # Jan1 wk, Jan10 wk+1
        (2, 2, 9, "view"),
        (3, 8, 9, "view"),
    ]
    got = {(r.cohort_week, r.age_weeks): r.n_active
           for r in cohort_retention(_ev(spark, rows)).collect()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}


def test_lisa_sums_to_global(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from osc_geo_h3grid_srv_spark.operators.hotspot import (
        local_moran_grid, morans_i_grid)
    rng = np.random.default_rng(9)
    pts = {(int(a), int(b)): float(v) for a, b, v in zip(
        rng.integers(0, 8, 120), rng.integers(0, 8, 120),
        rng.integers(0, 100, 120))}
    df = spark.createDataFrame(
        [(a, b, v) for (a, b), v in pts.items()],
        "gx long, gy long, x double")
    g = morans_i_grid(df).collect()[0]
    loc = local_moran_grid(df).collect()
    # Anselin consistency: sum_i I_i = W * global I
    assert sum(r.local_i for r in loc) == pytest.approx(
        g.w_pairs * g.morans_i, rel=1e-3)
    # quadrant labels agree with the signs they encode
    for r in loc:
        assert r.quadrant in ("HH", "LL", "HL", "LH")
    assert {r.quadrant for r in loc} >= {"HH", "LL"}
