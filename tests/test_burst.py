"""Temporal burst z-scores (operators/burst.py) vs a brute python
reference over sparse bucket series."""

import datetime as dt

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.burst import burst_zscores

_EPOCH = dt.datetime(2024, 1, 1)
_BASE = int((_EPOCH - dt.datetime(1970, 1, 1)).total_seconds())


def _mk(spark, rows):
    """rows: (key, seconds-offset)."""
    return spark.createDataFrame(
        [(k, _EPOCH + dt.timedelta(seconds=float(s))) for k, s in rows],
        "k string, ts timestamp_ntz")


def _brute(rows, bucket_s, trailing, min_trailing):
    from collections import Counter
    cnt = Counter((k, (_BASE + s) // bucket_s) for k, s in rows)
    out = {}
    for (k, b), n in cnt.items():
        hist = [cnt[(k, bb)] for bb in range(b - trailing, b)
                if (k, bb) in cnt]
        z = None
        if len(hist) >= min_trailing:
            mean = sum(hist) / len(hist)
            var = sum(h * h for h in hist) / len(hist) - mean * mean
            if var > 0:
                z = round((n - mean) / var ** 0.5, 5)
        out[(k, b)] = (n, len(hist), z)
    return out


def test_matches_brute_random(spark):
    rng = np.random.default_rng(31)
    rows = [(f"k{int(k)}", int(s)) for k, s in zip(
        rng.integers(0, 3, 600), rng.integers(0, 40 * 60, 600))]
    # a planted burst: key k0 floods one minute late in the series
    rows += [("k0", 35 * 60 + int(s)) for s in rng.integers(0, 60, 80)]
    df = _mk(spark, rows)
    got = {(r["k"], r["bucket"]): (r["n"], r["n_trail"], r["z"])
           for r in burst_zscores(df, "k", "ts", bucket_s=60.0,
                                  trailing=10, min_trailing=4)
           .collect()}
    want = _brute(rows, 60, 10, 4)
    assert set(got) == set(want)
    for key in want:
        n, h, z = want[key]
        gn, gh, gz = got[key]
        assert (gn, gh) == (n, h), key
        if z is None:
            assert gz is None, key
        else:
            assert gz == pytest.approx(z, abs=2e-5), key
    # the planted flood bucket is a strong positive burst
    burst_bucket = (_BASE + 35 * 60) // 60
    assert got[("k0", burst_bucket)][2] > 5


def test_short_history_and_zero_variance_are_null(spark):
    # constant series: variance 0 -> z NULL; early buckets: short
    # history -> z NULL
    rows = [("a", 60 * i + 1) for i in range(10)]
    df = _mk(spark, rows)
    got = {r["bucket"] - (_BASE // 60): (r["n_trail"], r["z"])
           for r in burst_zscores(df, "k", "ts", bucket_s=60.0,
                                  trailing=5, min_trailing=3)
           .collect()}
    assert got[0] == (0, None)
    assert got[2] == (2, None)       # below min_trailing
    assert got[5] == (5, None)       # full history, zero variance
    assert len(got) == 10


def test_bad_args_raise(spark):
    df = _mk(spark, [("a", 1)])
    with pytest.raises(ValueError, match="bucket_s"):
        burst_zscores(df, "k", "ts", bucket_s=0)
    with pytest.raises(ValueError, match="trailing"):
        burst_zscores(df, "k", "ts", bucket_s=60, trailing=0)
    with pytest.raises(ValueError, match="min_trailing"):
        burst_zscores(df, "k", "ts", bucket_s=60, trailing=5,
                      min_trailing=9)
