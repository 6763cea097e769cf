"""Grid DBSCAN (operators/dbscan.py) vs a brute-force NumPy/python
reference of the same cell-granularity semantics, plus structural
invariants (core connectivity, border adjacency, deterministic
labels)."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators.dbscan import (
    _OFF, _SPAN, dbscan_grid)


def _key(gx, gy):
    return (gx + _OFF) * _SPAN + (gy + _OFF)


def _brute(points, min_pts):
    """cell -> (n_pts, is_core, cluster_or_None), same semantics as
    the operator docstring."""
    from collections import Counter
    cnt = Counter(points)
    nb9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def nbhd(c):
        return sum(cnt.get((c[0] + dx, c[1] + dy), 0) for dx, dy in nb9)

    core = {c for c in cnt if nbhd(c) >= min_pts}
    # union-find over core queen adjacency
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for c in core:
        for dx, dy in nb9:
            d = (c[0] + dx, c[1] + dy)
            if d in core:
                ra, rb = find(c), find(d)
                if ra != rb:
                    parent[ra] = rb
    comp = {}
    for c in core:
        comp.setdefault(find(c), []).append(c)
    lab = {}
    for members in comp.values():
        m = min(_key(*c) for c in members)
        for c in members:
            lab[c] = m
    out = {}
    for c, n in cnt.items():
        if c in core:
            out[c] = (n, True, lab[c])
        else:
            adj = [lab[(c[0] + dx, c[1] + dy)] for dx, dy in nb9
                   if (dx, dy) != (0, 0)
                   and (c[0] + dx, c[1] + dy) in core]
            out[c] = (n, False, min(adj) if adj else None)
    return out


def _run(spark, points, min_pts):
    df = spark.createDataFrame(points, "gx long, gy long")
    got = {(r["gx"], r["gy"]): (r["n_pts"], r["is_core"], r["cluster"])
           for r in dbscan_grid(df, min_pts=min_pts).collect()}
    assert got == _brute(points, min_pts)
    return got


def test_matches_brute_random(spark):
    rng = np.random.default_rng(17)
    # three planted blobs + uniform noise
    pts = []
    for cx, cy, n in [(0, 0, 60), (15, -7, 45), (-12, 9, 30)]:
        pts += [(int(cx + x), int(cy + y)) for x, y in zip(
            rng.normal(0, 2.0, n).round(), rng.normal(0, 2.0, n).round())]
    pts += [(int(x), int(y)) for x, y in zip(
        rng.integers(-40, 40, 50), rng.integers(-40, 40, 50))]
    for min_pts in (3, 6, 12):
        got = _run(spark, pts, min_pts)
        assert any(v[1] for v in got.values()), f"min_pts={min_pts}"


def test_two_blobs_separate_then_bridge(spark):
    blob = [(x, y) for x in range(3) for y in range(3)]
    far = [(x + 10, y) for x, y in blob]
    got = _run(spark, blob + far, min_pts=4)
    labs = {v[2] for v in got.values() if v[2] is not None}
    assert len(labs) == 2
    # one bridging chain of dense cells merges them (duplicate points
    # make the chain cells core)
    bridge = [(x, 1) for x in range(3, 10) for _ in range(4)]
    got2 = _run(spark, blob + far + bridge, min_pts=4)
    labs2 = {v[2] for v in got2.values() if v[2] is not None}
    assert len(labs2) == 1


def test_isolated_core_cell_is_singleton_cluster(spark):
    pts = [(5, 5)] * 7 + [(100, 100)]
    got = _run(spark, pts, min_pts=4)
    assert got[(5, 5)] == (7, True, _key(5, 5))
    assert got[(100, 100)] == (1, False, None)


def test_border_takes_min_adjacent_label(spark):
    # mass SPREAD across each core's neighborhood (a cell adjacent to
    # one heavy cell would itself be core under neighborhood-sum
    # density): cores at (0,0) and (2,0) (nbhd = 9), the sparse cell
    # (1,0) between them is border and must take the smaller core
    # key, deterministically
    pts = ([(-1, 0)] * 4 + [(0, 0)] + [(1, 0)] * 4
           + [(2, 0)] + [(3, 0)] * 4)
    got = _run(spark, pts, min_pts=9)
    assert got[(0, 0)][1] and got[(2, 0)][1]
    assert got[(1, 0)][1] is False
    assert got[(1, 0)][2] == min(_key(0, 0), _key(2, 0))
    # flanks are border to their single adjacent core
    assert got[(-1, 0)] == (4, False, _key(0, 0))
    assert got[(3, 0)] == (4, False, _key(2, 0))


def test_validate_range_and_args(spark):
    df = spark.createDataFrame([(1 << 21, 0)], "gx long, gy long")
    with pytest.raises(ValueError, match="packing range"):
        dbscan_grid(df, min_pts=1)
    ok = spark.createDataFrame([(0, 0)], "gx long, gy long")
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_grid(ok, min_pts=0)
