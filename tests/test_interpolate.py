"""idw_interpolate correctness gates (SURVEY.md J5; reference loader
semantics: k=3 nearest within max_dist, geomesh.py:44).

Round-3 addition (VERDICT r02 What's-wrong #1): the bucket-grid
candidate join must find the TRUE k nearest at every latitude, so each
test compares against a brute-force all-pairs haversine kNN computed in
NumPy. Fixtures deliberately include the formerly-broken regimes:
sparse due-east/west neighbors above 34 deg latitude and a near-pole
cluster.
"""

import math

import numpy as np
import pytest

R_KM = 6371.0088


def _haversine(lat1, lng1, lat2, lng2):
    la1, la2 = np.radians(lat1), np.radians(lat2)
    dla = la2 - la1
    dlo = np.radians(lng2) - np.radians(lng1)
    h = (np.sin(dla / 2) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2)
    return 2 * R_KM * np.arcsin(np.sqrt(h))


def _brute_idw(cells, pts, k, power, max_dist):
    """cells: [(id, lat, lng)], pts: [(lat, lng, val)] -> {id: (value,
    n)} for cells with >=1 neighbor; ties broken (dist, lat, lng)."""
    out = {}
    plat = np.array([p[0] for p in pts])
    plng = np.array([p[1] for p in pts])
    pval = np.array([p[2] for p in pts])
    for cid, clat, clng in cells:
        d = _haversine(clat, clng, plat, plng)
        order = sorted(range(len(pts)),
                       key=lambda i: (d[i], plat[i], plng[i]))
        near = [i for i in order if d[i] <= max_dist][:k]
        if not near:
            continue
        w = 1.0 / np.maximum(d[near], 1e-9) ** power
        out[str(cid)] = (float((w * pval[near]).sum() / w.sum()),
                         len(near))
    return out


def _run(spark, cells, pts, **kw):
    from osc_geo_h3grid_srv_spark.operators.interpolate import (
        idw_interpolate)
    cdf = spark.createDataFrame(
        [(str(c[0]), float(c[1]), float(c[2])) for c in cells],
        "h3_cell string, latitude double, longitude double")
    pdf = spark.createDataFrame(
        [(float(p[0]), float(p[1]), float(p[2])) for p in pts],
        "latitude double, longitude double, value double")
    rows = idw_interpolate(cdf, pdf, "value", **kw).collect()
    return {r["h3_cell"]: (r["value"], r["n_neighbors"]) for r in rows}


def _check(spark, cells, pts, k=3, power=2.0, max_dist=100.0, **kw):
    got = _run(spark, cells, pts, k=k, power=power, max_dist_km=max_dist,
               **kw)
    want = _brute_idw(cells, pts, k, power, max_dist)
    assert set(got) == set(want)
    for cid in want:
        assert got[cid][1] == want[cid][1], (cid, got[cid], want[cid])
        assert got[cid][0] == pytest.approx(want[cid][0], rel=1e-9)


def test_highlat_due_east_west(spark):
    """The VERDICT r02 headline bug: at lat 48-84, points 0.75-0.95x
    max_dist due east/west span >2 equatorial-pitch lng buckets and
    were dropped by the pre-fix 3x3 grid."""
    cells, pts = [], []
    for i in range(25):
        lat = 48.0 + 1.5 * i
        cells.append((i, lat, 10.0))
        pts.append((lat + 0.3 * 100 / 111.32, 10.0, 10.0 * i + 1))
        for frac, dv in ((0.75, 2), (0.95, 3)):
            dlng = math.degrees(2 * math.asin(
                math.sin(frac * 100 / (2 * R_KM))
                / math.cos(math.radians(lat))))
            sign = 1 if dv == 2 else -1
            pts.append((lat, 10.0 + sign * dlng, 10.0 * i + dv))
    _check(spark, cells, pts, max_dist=100.0)
    got = _run(spark, cells, pts, k=3, power=2.0, max_dist_km=100.0)
    assert all(n == 3 for _, n in got.values())


def test_random_scatter_all_latitudes(spark):
    """Brute-force parity on a deterministic scatter spanning lat -80
    to 80, k exceeding local density in places, some cells with zero
    neighbors (must be absent from the output)."""
    rng = np.random.RandomState(7)
    pts = [(float(lat), float(lng), float(v))
           for lat, lng, v in zip(rng.uniform(-80, 80, 300),
                                  rng.uniform(-170, 170, 300),
                                  rng.uniform(0, 100, 300))]
    cells = [(i, float(lat), float(lng))
             for i, (lat, lng) in enumerate(zip(
                 rng.uniform(-80, 80, 60), rng.uniform(-170, 170, 60)))]
    _check(spark, cells, pts, k=5, power=1.5, max_dist=1500.0)


def test_near_pole_cluster(spark):
    """lat 86-89.6: cos(lat) ~ 0 degenerates the lng-pitch bound; the
    band must collapse to a single 360-degree bucket and still find
    neighbors at any longitude separation."""
    cells = [(0, 89.0, 0.0), (1, 87.5, -150.0), (2, 86.0, 60.0)]
    pts = [(89.2, 175.0, 5.0), (89.1, -90.0, 7.0), (88.8, 10.0, 9.0),
           (87.6, 160.0, 11.0), (86.2, 65.0, 13.0), (86.1, 50.0, 17.0)]
    _check(spark, cells, pts, k=3, power=2.0, max_dist=300.0)


def test_broadcast_cells_path_identical(spark):
    """broadcast_cells=True must be a pure physical hint: byte-equal
    results to the default path."""
    rng = np.random.RandomState(11)
    pts = [(float(a), float(b), float(v))
           for a, b, v in zip(rng.uniform(30, 70, 120),
                              rng.uniform(-10, 30, 120),
                              rng.uniform(0, 50, 120))]
    cells = [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(
        rng.uniform(30, 70, 30), rng.uniform(-10, 30, 30)))]
    base = _run(spark, cells, pts, k=3, power=2.0, max_dist_km=200.0)
    bc = _run(spark, cells, pts, k=3, power=2.0, max_dist_km=200.0,
              broadcast_cells=True)
    assert base == bc


def test_exact_hit_epsilon_clamp(spark):
    """A point exactly on the cell centroid dominates via the 1e-9
    clamp instead of dividing by zero."""
    cells = [(0, 50.0, 8.0)]
    pts = [(50.0, 8.0, 42.0), (50.1, 8.0, 7.0), (50.0, 8.2, 9.0)]
    got = _run(spark, cells, pts, k=3, power=2.0, max_dist_km=100.0)
    assert got["0"][1] == 3
    assert got["0"][0] == pytest.approx(42.0, abs=1e-6)


def test_antimeridian_wrap(spark):
    # cells hugging lng=+-180 at mid/high latitude; true nearest
    # neighbors sit on the OTHER side of the seam (formerly the
    # documented miss). Brute force wraps naturally via haversine.
    cells = [(f"c{i}", 40.0 + 3.0 * i, 179.6 if i % 2 else -179.7)
             for i in range(8)]
    pts = []
    for i in range(8):
        lat = 40.0 + 3.0 * i
        # one point just across the seam (within ~60km), one same-side
        pts.append((lat + 0.1, -179.8 if i % 2 else 179.5,
                    float(10 * i + 1)))
        pts.append((lat - 0.2, 179.9 if i % 2 else -179.9,
                    float(10 * i + 2)))
    _check(spark, cells, pts, k=3, max_dist=200.0)


def test_antimeridian_sparse_exact_neighbor_count(spark):
    # exactly one neighbor per cell, always across the seam: a miss
    # shows up as a missing output row, not just a value drift
    cells = [(f"s{i}", 35.0 + 5.0 * i, 179.95) for i in range(6)]
    pts = [(35.0 + 5.0 * i, -179.95, float(i)) for i in range(6)]
    got = _run(spark, cells, pts, k=3, power=2.0, max_dist_km=50.0)
    assert set(got) == {f"s{i}" for i in range(6)}
    for i in range(6):
        assert got[f"s{i}"][1] == 1


def test_no_seam_no_behavior_change(spark):
    # far from the seam the wrap explode must be a no-op: every point
    # keeps exactly one copy (output identical to brute force)
    cells = [(f"n{i}", -60.0 + 10.0 * i, 10.0 + i) for i in range(10)]
    pts = [(-60.0 + 10.0 * i + dy, 10.0 + i + dx, float(i + dy + dx))
           for i in range(10) for dy in (-0.3, 0.2) for dx in (-0.4, 0.3)]
    _check(spark, cells, pts, k=3, max_dist=120.0)


def test_seam_across_degenerate_band_boundary(spark):
    # point in a single-360-bucket (near-pole) band serving a seam cell
    # in the adjacent NORMAL band, and vice versa — the copy trigger
    # must consider all three candidate bands, and copies must never
    # double-match inside the degenerate band
    cells = [("hi", 74.0, 179.2), ("lo", 64.0, -179.3)]
    pts = [(76.0, -179.0, 3.0), (66.0, 179.5, 7.0),
           (75.5, 179.8, 11.0), (64.5, -179.9, 13.0)]
    _check(spark, cells, pts, k=5, power=1.5, max_dist=1500.0)
