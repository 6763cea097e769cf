"""Getis-Ord Gi* hotspot statistic (operators/hotspot.py) vs a pure
python brute-force oracle, on both the queen-grid and H3 k-ring
backends, plus an analytic planted-hotspot fixture."""

import math

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.hotspot import (
    gi_star_grid, gi_star_h3)


def _brute_gi(values, neighborhoods):
    """values: {key: x}; neighborhoods: {key: set of keys (self incl.)
    restricted to present keys}. -> {key: z round 5 or None}"""
    xs = list(values.values())
    n = float(len(xs))
    xbar = sum(xs) / n
    s = math.sqrt(sum(x * x for x in xs) / n - xbar * xbar)
    out = {}
    for k, nbrs in neighborhoods.items():
        w = float(len(nbrs))
        sx = sum(values[j] for j in nbrs)
        den = s * math.sqrt((n * w - w * w) / (n - 1.0))
        out[k] = round((sx - xbar * w) / den, 5) if den != 0 else None
    return out


def test_grid_vs_brute(spark):
    rng = np.random.default_rng(42)
    pts = {(int(gx), int(gy)): float(v) for gx, gy, v in zip(
        rng.integers(0, 12, 300), rng.integers(0, 12, 300),
        rng.integers(0, 1000, 300))}
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in pts.items()],
        "gx long, gy long, x double")
    nbh = {k: {(k[0] + dx, k[1] + dy)
               for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (k[0] + dx, k[1] + dy) in pts} for k in pts}
    want = _brute_gi(pts, nbh)
    got = {(r.gx, r.gy): r.gi_z for r in gi_star_grid(df).collect()}
    assert got == want


def test_planted_hotspot_tops_the_grid(spark):
    # flat background value 10, a 3x3 block of 100s at (5..7, 5..7):
    # the block center must carry the max z, far corners near 0
    rows = []
    for gx in range(12):
        for gy in range(12):
            v = 100.0 if 5 <= gx <= 7 and 5 <= gy <= 7 else 10.0
            rows.append((gx, gy, v))
    df = spark.createDataFrame(rows, "gx long, gy long, x double")
    z = {(r.gx, r.gy): r.gi_z for r in gi_star_grid(df).collect()}
    assert max(z, key=z.get) == (6, 6)
    assert z[(6, 6)] > 5.0
    assert abs(z[(0, 0)]) < 1.0
    assert z[(0, 0)] < 0  # below-mean corner is (weakly) cold


def test_h3_vs_brute(spark):
    from osc_geo_h3grid_srv_spark.functions import h3core
    rng = np.random.default_rng(7)
    lat = rng.uniform(40, 55, 200)
    lng = rng.uniform(5, 20, 200)
    cells = h3core.latlng_to_cell(lat, lng, 4)
    vals = rng.integers(0, 1000, 200).astype(float)
    agg = {}
    for c, v in zip(cells.tolist(), vals.tolist()):
        agg[c] = agg.get(c, 0.0) + v
    df = spark.createDataFrame(
        [(int(np.int64(np.uint64(c))), v) for c, v in agg.items()],
        "cell long, x double")
    present = set(agg)
    nbh = {}
    for c in agg:
        ring = np.unique(
            h3core.k_ring(np.array([c], dtype=np.uint64), 1).ravel())
        nbh[c] = {int(r) for r in ring.tolist() if int(r) in present}
    want = _brute_gi(agg, nbh)
    got = {int(np.uint64(np.int64(r.cell))): r.gi_z
           for r in gi_star_h3(df, k=1).collect()}
    assert got == want
    assert len(got) == len(agg)


def test_h3_k_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "cell long, x double")
    with pytest.raises(ValueError):
        gi_star_h3(df, k=0)


def _brute_moran(values):
    """values: {(gx,gy): x} with queen weights, self excluded."""
    keys = list(values)
    n = float(len(keys))
    xbar = sum(values.values()) / n
    sc = w = 0.0
    deg = {}
    for (a, b) in keys:
        d = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx or dy) and (a + dx, b + dy) in values:
                    sc += ((values[(a, b)] - xbar)
                           * (values[(a + dx, b + dy)] - xbar))
                    w += 1.0
                    d += 1
        deg[(a, b)] = d
    ss = sum((x - xbar) ** 2 for x in values.values())
    mi = (n / w) * sc / ss
    ei = -1.0 / (n - 1.0)
    s1, s2 = 2.0 * w, 4.0 * sum(d * d for d in deg.values())
    var = ((n * n * s1 - n * s2 + 3.0 * w * w)
           / (w * w * (n * n - 1.0))) - ei * ei
    z = (mi - ei) / math.sqrt(var) if var > 0 else None
    return (int(n), int(w), round(mi, 5), round(ei, 5),
            round(z, 5) if z is not None else None)


def test_moran_vs_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.hotspot import morans_i_grid
    rng = np.random.default_rng(3)
    pts = {(int(gx), int(gy)): float(v) for gx, gy, v in zip(
        rng.integers(0, 10, 250), rng.integers(0, 10, 250),
        rng.integers(0, 1000, 250))}
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in pts.items()],
        "gx long, gy long, x double")
    r = morans_i_grid(df).collect()[0]
    assert (r.n, r.w_pairs, r.morans_i, r.e_i, r.z) == _brute_moran(pts)


def test_moran_sign_gradient_vs_checkerboard(spark):
    from osc_geo_h3grid_srv_spark.operators.hotspot import morans_i_grid
    grad = {(gx, gy): float(gx + gy)
            for gx in range(10) for gy in range(10)}
    # NB: a (gx+gy)%2 checkerboard is near-NEUTRAL under queen weights
    # (the 4 diagonal neighbors are same-colored and cancel the 4 rook
    # ones) — vertical stripes are the robustly anti-clustered pattern
    chk = {(gx, gy): float(gx % 2)
           for gx in range(10) for gy in range(10)}
    dfg = spark.createDataFrame(
        [(a, b, v) for (a, b), v in grad.items()],
        "gx long, gy long, x double")
    dfc = spark.createDataFrame(
        [(a, b, v) for (a, b), v in chk.items()],
        "gx long, gy long, x double")
    rg = morans_i_grid(dfg).collect()[0]
    rc = morans_i_grid(dfc).collect()[0]
    # smooth gradient clusters (I > 0, strongly significant);
    # stripes anti-cluster (I < 0)
    assert rg.morans_i > 0.5 and rg.z > 3.0
    assert rc.morans_i < -0.4 and rc.z < -3.0
