"""Exact quantiles, fuzzy pair join, geodesic ring stats, and the
skew profile (operators/{quantiles,fuzzyjoin,sphgeom,skewprof}.py)
vs brute-force references."""

import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.fuzzyjoin import fuzzy_pairs
from osc_geo_h3grid_srv_spark.operators.quantiles import exact_quantiles
from osc_geo_h3grid_srv_spark.operators.skewprof import skew_profile
from osc_geo_h3grid_srv_spark.operators.sphgeom import (
    _EARTH_R_KM, geodesic_ring_stats)


# ------------------------------------------------------------ quantiles

def _brute_q(xs, p):
    xs = sorted(xs)
    n = len(xs)
    cum = 0
    for v in xs:
        cum += 1
        if cum >= p * n:
            return v
    return xs[-1]


def test_exact_quantiles_matches_brute(spark):
    rng = np.random.default_rng(2)
    rows = ([("a", float(v)) for v in rng.integers(0, 100, 500)]
            + [("b", float(v)) for v in rng.integers(0, 7, 99)])
    df = spark.createDataFrame(rows, "key string, val double")
    probs = [0.1, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {(r.key, r.p): r.q for r in
           exact_quantiles(df, probs).collect()}
    xs = {"a": [v for k, v in rows if k == "a"],
          "b": [v for k, v in rows if k == "b"]}
    for k in xs:
        for p in probs:
            assert got[(k, p)] == _brute_q(xs[k], p), (k, p)
    assert len(got) == 2 * len(probs)  # exactly one row per (key, p)


def test_exact_quantiles_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "key string, val double")
    got = {r.p: r.q for r in exact_quantiles(df, [0.5, 1.0]).collect()}
    assert got == {0.5: 1.0, 1.0: 3.0}  # NULLs dropped, n = 2
    for bad in ([], [0.0], [1.1]):
        with pytest.raises(ValueError):
            exact_quantiles(df, bad)


# ------------------------------------------------------------ fuzzy join

def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_fuzzy_pairs_matches_brute(spark):
    rng = np.random.default_rng(4)
    words = ["".join(rng.choice(list("abcd"), size=rng.integers(3, 8)))
             for _ in range(40)]
    rows = [(i, w, w[0]) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string, block string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, max_dist=2).collect()}
    want = {}
    for i, (ia, sa, ba) in enumerate(rows):
        for ib, sb, bb in rows[i + 1:]:
            if ba == bb and _lev(sa, sb) <= 2:
                want[(ia, ib)] = _lev(sa, sb)
    assert got == want


def test_fuzzy_pairs_blocking_and_validation(spark):
    rows = [(1, "abc", "x"), (2, "abd", "y")]  # dist 1, different block
    df = spark.createDataFrame(rows, "id long, s string, block string")
    assert fuzzy_pairs(df, 2).count() == 0
    with pytest.raises(ValueError):
        fuzzy_pairs(df, -1)


# ------------------------------------------------------- geodesic stats

def test_geodesic_square_at_equator(spark):
    # ~1°x1° "square" straddling the equator: area ≈ (111.19 km)², the
    # trapezoid formula is near-exact at small extents
    d = 0.5
    ring = [(-d, -d), (-d, d), (d, d), (d, -d)]
    rows = [(1, i, la, lo) for i, (la, lo) in enumerate(ring)]
    df = spark.createDataFrame(
        rows, "region long, seq long, lat double, lng double")
    out = geodesic_ring_stats(df).collect()[0]
    side = 2 * d * math.pi / 180.0 * _EARTH_R_KM
    assert out.n_vertices == 4
    assert out.area_km2 == pytest.approx(side * side, rel=2e-4)
    assert out.perimeter_km == pytest.approx(4 * side, rel=2e-3)


def test_geodesic_orientation_invariant(spark):
    ring = [(10.0, 20.0), (10.0, 21.0), (11.0, 21.0), (11.0, 20.0)]
    fwd = [(1, i, la, lo) for i, (la, lo) in enumerate(ring)]
    rev = [(1, i, la, lo) for i, (la, lo) in enumerate(ring[::-1])]
    schema = "region long, seq long, lat double, lng double"
    a = geodesic_ring_stats(
        spark.createDataFrame(fwd, schema)).collect()[0]
    b = geodesic_ring_stats(
        spark.createDataFrame(rev, schema)).collect()[0]
    assert a.area_km2 == b.area_km2 > 0
    assert a.perimeter_km == b.perimeter_km


# ----------------------------------------------------------- skew profile

def test_skew_profile(spark):
    rows = ([("hot",)] * 50 + [("warm",)] * 10
            + [(f"cold{i}",) for i in range(40)])
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_k=3).collect()
    by_rank = {r.rank: r for r in out}
    assert [by_rank[i].key for i in (1, 2, 3)] == [
        "hot", "warm", "cold0"]
    r1 = by_rank[1]
    assert (r1.cnt, r1.n_keys, r1.n_rows) == (50, 42, 100)
    assert r1.share == 0.5
    assert r1.skew == pytest.approx(50 / (100 / 42), abs=1e-4)
    with pytest.raises(ValueError):
        skew_profile(df, "k", top_k=0)


# ------------------------------------------------------- session paths

def test_session_paths(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 8)
    rows = []
    # 3 users do view>click, 1 user does view>view, same day
    for u, seq in [(1, ["view", "click"]), (2, ["view", "click"]),
                   (3, ["view", "click"]), (4, ["view", "view"])]:
        rows += [(u, u * 10 + i, t0 + dt.timedelta(minutes=i), s)
                 for i, s in enumerate(seq)]
    from osc_geo_h3grid_srv_spark.operators.funnel import session_paths
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    out = [(r.rank, r.path, r.n)
           for r in session_paths(df, top_k=5, max_steps=8).collect()]
    assert out == [(1, "view>click", 3), (2, "view>view", 1)]
    # max_steps truncation
    out2 = session_paths(df, top_k=5, max_steps=1).collect()
    assert [(r.path, r.n) for r in out2] == [("view", 4)]
    import pytest as _pt
    with _pt.raises(ValueError):
        session_paths(df, top_k=0)


# ---------------------------------------------------------- reciprocity

def test_link_reciprocity(spark):
    from osc_geo_h3grid_srv_spark.operators.linkgraph import (
        link_reciprocity)
    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (3, 5), (5, 1),
             (1, 2)]  # duplicate edge must not double-count
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: (r.out_deg, r.recip, r.ratio)
           for r in link_reciprocity(df).collect()}
    assert out[1] == (2, 1, 0.5)     # 1->2 recip, 1->3 not
    assert out[3] == (2, 1, 0.5)     # 3->4 recip, 3->5 not
    assert out[5] == (1, 0, 0.0)
    assert out[2] == (1, 1, 1.0)


# ----------------------------------------------------- distance clusters

def test_distance_clusters_composition(spark):
    from osc_geo_h3grid_srv_spark.operators.cluster import (
        connected_components)
    from osc_geo_h3grid_srv_spark.operators.distjoin import (
        within_distance_pairs)
    # two tight clusters + one singleton
    pts = [(1, 50.0, 8.0), (2, 50.1, 8.1), (3, 50.2, 8.0),
           (4, -30.0, 100.0), (5, -30.1, 100.1),
           (6, 0.0, -170.0)]
    df = spark.createDataFrame(pts, "id long, lat double, lng double")
    cc = {r.node: r.component for r in connected_components(
        within_distance_pairs(df, 100.0)).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}  # 6 is a singleton
