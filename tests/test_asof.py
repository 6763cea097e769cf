"""Temporal as-of join (operators/asof.py) vs a brute-force per-row
scan, plus the property the driver entry relies on: the bucketed
two-phase plan is row-identical to the simple single-window plan on
randomized inputs (including tolerance filtering, NULL payload fields,
and ties at equal timestamps)."""

import datetime as dt

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.asof import asof_join

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return _EPOCH + dt.timedelta(seconds=float(s))


def _mk_left(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(rows)],
        "lid long, k long, lts timestamp_ntz")


def _mk_right(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), v) for (k, s, v) in rows],
        "k long, rts timestamp_ntz, val double")


def _brute(left_rows, right_rows, tol_s=None):
    """lid -> (val, asof_s) or (None, None)."""
    out = {}
    for i, (k, s) in enumerate(left_rows):
        best = None
        for (rk, rs, v) in right_rows:
            if rk == k and rs <= s and (best is None or rs > best[0]):
                best = (rs, v)
        if best is None or (tol_s is not None and s - best[0] > tol_s):
            out[i] = (None, None)
        else:
            out[i] = (best[1], best[0])
    return out


def _collect(df):
    out = {}
    for r in df.collect():
        a = (None if r["asof_ts"] is None
             else (r["asof_ts"] - _EPOCH).total_seconds())
        out[r["lid"]] = (r["val"], a)
    return out


def test_matches_brute_simple_and_bucketed(spark):
    rng = np.random.default_rng(7)
    left_rows = [(int(k), round(float(s), 3))
                 for k, s in zip(rng.integers(0, 6, 120),
                                 rng.uniform(0, 5000, 120))]
    right_rows = []
    seen = set()
    for k, s in zip(rng.integers(0, 6, 80), rng.uniform(0, 5000, 80)):
        key = (int(k), round(float(s), 3))
        if key not in seen:  # contract: unique per (key, right_ts)
            seen.add(key)
            right_rows.append((key[0], key[1], round(key[1] / 10, 3)))
    left, right = _mk_left(spark, left_rows), _mk_right(spark, right_rows)
    want = _brute(left_rows, right_rows)
    for bucket_s in (None, 100.0, 733.0, 10_000.0):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], bucket_s=bucket_s))
        assert got == want, f"bucket_s={bucket_s}"


def test_tolerance_matches_brute(spark):
    rng = np.random.default_rng(8)
    left_rows = [(int(k), round(float(s), 3))
                 for k, s in zip(rng.integers(0, 4, 80),
                                 rng.uniform(0, 3000, 80))]
    right_rows = [(int(k), round(float(s), 3), float(i))
                  for i, (k, s) in enumerate(
                      zip(rng.integers(0, 4, 40),
                          rng.uniform(0, 3000, 40)))]
    left, right = _mk_left(spark, left_rows), _mk_right(spark, right_rows)
    want = _brute(left_rows, right_rows, tol_s=250.0)
    for bucket_s in (None, 60.0):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], tolerance_s=250.0,
                                 bucket_s=bucket_s))
        assert got == want, f"bucket_s={bucket_s}"


def test_right_row_at_probe_timestamp_matches(spark):
    left = _mk_left(spark, [(1, 100.0)])
    right = _mk_right(spark, [(1, 100.0, 42.0), (1, 50.0, 7.0)])
    for bucket_s in (None, 30.0):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], bucket_s=bucket_s))
        assert got == {0: (42.0, 100.0)}, f"bucket_s={bucket_s}"


def test_null_left_ts_gets_null_payload(spark):
    left = spark.createDataFrame([(0, 1, None), (1, 1, _ts(200))],
                                 "lid long, k long, lts timestamp_ntz")
    right = _mk_right(spark, [(1, 100.0, 5.0)])
    got = _collect(asof_join(left, right, "k", "lts", "rts", ["val"]))
    assert got == {0: (None, None), 1: (5.0, 100.0)}


def test_null_payload_field_does_not_mix_rows(spark):
    # the LATER right row carries val=NULL; a per-column carry would
    # resurrect 3.0 from the earlier row — the struct carry must not
    left = _mk_left(spark, [(1, 300.0)])
    right = spark.createDataFrame(
        [(1, _ts(100), 3.0), (1, _ts(200), None)],
        "k long, rts timestamp_ntz, val double")
    for bucket_s in (None, 80.0):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], bucket_s=bucket_s))
        assert got == {0: (None, 200.0)}, f"bucket_s={bucket_s}"


def test_carry_crosses_many_empty_buckets(spark):
    # right row in bucket 0, left probe ~40 buckets later: the
    # carry-in table must bridge the empty range
    left = _mk_left(spark, [(1, 4000.0)])
    right = _mk_right(spark, [(1, 5.0, 9.0)])
    got = _collect(asof_join(left, right, "k", "lts", "rts",
                             ["val"], bucket_s=100.0))
    assert got == {0: (9.0, 5.0)}


def test_internal_and_payload_collisions_raise(spark):
    left = _mk_left(spark, [(1, 10.0)]).withColumnRenamed("lid", "val")
    right = _mk_right(spark, [(1, 5.0, 1.0)])
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, "k", "lts", "rts", ["val"])
    with pytest.raises(ValueError, match="non-empty"):
        asof_join(_mk_left(spark, [(1, 10.0)]), right,
                  "k", "lts", "rts", [])
    with pytest.raises(ValueError, match="bucket_s"):
        asof_join(_mk_left(spark, [(1, 10.0)]), right,
                  "k", "lts", "rts", ["val"], bucket_s=0.0)


def _brute_fwd(left_rows, right_rows, tol_s=None):
    """forward direction: earliest right with rs >= s."""
    out = {}
    for i, (k, s) in enumerate(left_rows):
        best = None
        for (rk, rs, v) in right_rows:
            if rk == k and rs >= s and (best is None or rs < best[0]):
                best = (rs, v)
        if best is None or (tol_s is not None and best[0] - s > tol_s):
            out[i] = (None, None)
        else:
            out[i] = (best[1], best[0])
    return out


def test_forward_matches_brute_simple_and_bucketed(spark):
    rng = np.random.default_rng(13)
    left_rows = [(int(k), round(float(s), 3))
                 for k, s in zip(rng.integers(0, 6, 120),
                                 rng.uniform(0, 5000, 120))]
    right_rows = []
    seen = set()
    for k, s in zip(rng.integers(0, 6, 80), rng.uniform(0, 5000, 80)):
        key = (int(k), round(float(s), 3))
        if key not in seen:
            seen.add(key)
            right_rows.append((key[0], key[1], round(key[1] / 10, 3)))
    left, right = _mk_left(spark, left_rows), _mk_right(spark, right_rows)
    for tol in (None, 300.0):
        want = _brute_fwd(left_rows, right_rows, tol_s=tol)
        for bucket_s in (None, 100.0, 733.0):
            got = _collect(asof_join(left, right, "k", "lts", "rts",
                                     ["val"], tolerance_s=tol,
                                     bucket_s=bucket_s,
                                     direction="forward"))
            assert got == want, f"tol={tol} bucket_s={bucket_s}"


def test_forward_right_at_probe_and_nulls(spark):
    left = spark.createDataFrame(
        [(0, 1, _ts(100)), (1, 1, None)],
        "lid long, k long, lts timestamp_ntz")
    right = _mk_right(spark, [(1, 100.0, 42.0), (1, 150.0, 7.0)])
    for bucket_s in (None, 30.0):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], bucket_s=bucket_s,
                                 direction="forward"))
        assert got == {0: (42.0, 100.0), 1: (None, None)}, \
            f"bucket_s={bucket_s}"


def test_null_right_ts_rows_are_ignored(spark):
    left = _mk_left(spark, [(1, 100.0)])
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(50), 5.0)],
        "k long, rts timestamp_ntz, val double")
    for d in ("backward", "forward"):
        got = _collect(asof_join(left, right, "k", "lts", "rts",
                                 ["val"], direction=d))
        want = {0: (5.0, 50.0)} if d == "backward" else {0: (None, None)}
        assert got == want, d


def test_bad_direction_raises(spark):
    left = _mk_left(spark, [(1, 10.0)])
    right = _mk_right(spark, [(1, 5.0, 1.0)])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "lts", "rts", ["val"],
                  direction="nearest")
