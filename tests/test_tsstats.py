"""EWMA / CUSUM window-algebra operators (operators/tsstats.py) vs
sequential NumPy references, plus the Markov transition matrix
(operators/funnel.py)."""

import datetime as dt

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.funnel import markov_transitions
from osc_geo_h3grid_srv_spark.operators.tsstats import cusum, ewma


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts long, val double")


def _brute_ewma(xs, alpha, horizon):
    out = []
    for i in range(len(xs)):
        lo = max(0, i - horizon + 1)
        win = xs[lo:i + 1]
        ws = [(1 - alpha) ** (len(win) - 1 - j) for j in range(len(win))]
        out.append(sum(w * x for w, x in zip(ws, win)) / sum(ws))
    return out


def test_ewma_matches_brute(spark):
    rng = np.random.default_rng(5)
    xs = [float(v) for v in rng.integers(0, 50, 40)]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    got = {r.ts: r.ewma for r in
           ewma(_series_df(spark, rows), alpha=0.3, horizon=8,
                key_col="key", ts_col="ts", val_col="val").collect()}
    want = _brute_ewma(xs, 0.3, 8)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-6), i


def test_ewma_first_value_and_validation(spark):
    rows = [("a", 0, 10.0), ("a", 1, 0.0)]
    got = {r.ts: r.ewma for r in
           ewma(_series_df(spark, rows), alpha=0.5, horizon=4,
                key_col="key", ts_col="ts", val_col="val").collect()}
    assert got[0] == 10.0  # single-obs window is the value itself
    assert got[1] == pytest.approx(10.0 * 0.5 / 1.5, abs=1e-6)
    df = _series_df(spark, rows)
    for bad in ({"alpha": 0.0}, {"alpha": 1.0}, {"horizon": 0}):
        kw = {"alpha": 0.3, "horizon": 4} | bad
        with pytest.raises(ValueError):
            ewma(df, key_col="key", ts_col="ts", val_col="val", **kw)


def _brute_cusum(xs, mu0, k):
    s, out = 0.0, []
    for x in xs:
        s = max(0.0, s + (x - mu0 - k))
        out.append(s)
    return out


def test_cusum_matches_recursion(spark):
    rng = np.random.default_rng(9)
    xs = [float(v) for v in rng.normal(10, 2, 60)]
    xs[40:50] = [x + 6 for x in xs[40:50]]  # injected drift
    rows = [("a", i, x) for i, x in enumerate(xs)]
    out = {r.ts: r for r in
           cusum(_series_df(spark, rows), slack=1.0, threshold=10.0,
                 key_col="key", ts_col="ts", val_col="val").collect()}
    mu0 = sum(xs) / len(xs)
    want = _brute_cusum(xs, mu0, 1.0)
    alarms = 0
    for i, w in enumerate(want):
        assert out[i].s == pytest.approx(w, abs=1e-6), i
        assert out[i].alarm == (out[i].s > 10.0)
        alarms += out[i].alarm
    assert alarms > 0  # the injected drift must trip the alarm


def test_cusum_explicit_mu0_and_validation(spark):
    rows = [("a", 0, 5.0), ("a", 1, 9.0), ("a", 2, 1.0)]
    df = _series_df(spark, rows).withColumn(
        "mu", __import__("pyspark.sql.functions", fromlist=["lit"])
        .lit(4.0))
    out = {r.ts: r.s for r in
           cusum(df, slack=0.0, threshold=3.0, key_col="key",
                 ts_col="ts", val_col="val", mu0_col="mu").collect()}
    assert out == {0: 1.0, 1: 6.0, 2: 3.0}
    with pytest.raises(ValueError):
        cusum(df, slack=0.0, threshold=0.0, key_col="key",
              ts_col="ts", val_col="val")


def test_markov_transitions(spark):
    t0 = dt.datetime(2024, 1, 1)
    seq = ["view", "click", "view", "click", "purchase"]
    rows = [(1, i, t0 + dt.timedelta(minutes=i), s)
            for i, s in enumerate(seq)]
    rows += [(2, 10, t0, "view"), (2, 11, t0 + dt.timedelta(1), "view")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    out = {(r.prev_type, r.next_type): (r.n, r.p)
           for r in markov_transitions(df).collect()}
    # user1: view->click x2, click->view, click->purchase; user2: view->view
    assert out[("view", "click")] == (2, pytest.approx(2 / 3))
    assert out[("view", "view")] == (1, pytest.approx(1 / 3))
    assert out[("click", "view")] == (1, 0.5)
    assert out[("click", "purchase")] == (1, 0.5)
    assert len(out) == 4
