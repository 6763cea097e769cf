"""F11 CRS support (functions/crs.py) and the UTM-mode geometric buffer
(the reference's to_crs(UTM) -> buffer -> to_crs(4326) round trip,
shape.py:240-255)."""

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.functions import crs, geo


def test_utm_roundtrip_and_anchors():
    rng = np.random.RandomState(0)
    lat = rng.uniform(-79.0, 83.0, 20000)
    lng = rng.uniform(-180.0, 180.0, 20000)
    zones = np.array([crs.utm_zone(x) for x in lng])
    for z in np.unique(zones):
        m = zones == z
        for south in (False, True):
            e, n = crs.to_utm(lat[m], lng[m], int(z), south)
            la2, lo2 = crs.from_utm(e, n, int(z), south)
            assert np.abs(la2 - lat[m]).max() < 1e-7
            assert np.abs(lo2 - lng[m]).max() < 1e-7
    # zone 33 (central meridian 15E) anchors: equator-on-meridian maps
    # to the false easting, northing 0; Berlin lands at the published
    # EPSG:32633 coordinates (~391.8 km E, ~5819.8 km N)
    assert crs.zone_central_meridian(33) == 15.0
    e0, n0 = crs.to_utm(0.0, 15.0, 33)
    assert abs(float(e0) - 500000.0) < 1e-6 and abs(float(n0)) < 1e-6
    eb, nb = crs.to_utm(52.518, 13.405, 33)
    assert abs(float(eb) - 391774.0) < 5.0
    assert abs(float(nb) - 5819850.0) < 5.0
    assert crs.utm_zone(13.405) == 33
    assert crs.epsg_code(33) == "EPSG:32633"
    assert crs.epsg_code(34, south=True) == "EPSG:32734"


def test_buffer_utm_membership_property():
    """UTM-mode buffer is metrically round: membership must equal
    (inside original) OR (metric distance to boundary <= d), where the
    metric truth is computed in projected UTM space."""
    shell = [(47.0, 5.5), (49.5, 10.0), (47.0, 15.5), (52.0, 13.0),
             (55.5, 15.5), (55.5, 5.5), (51.0, 8.0)]
    hole = [(52.5, 9.0), (52.5, 10.5), (54.0, 10.5), (54.0, 9.0)]
    pp = geo.PackedPolygons.from_latlng_rings([[shell, hole]], ["region"])
    d_m = 40_000.0
    bp = geo.buffer_polygon(pp, d_m, units="meters", method="utm")
    assert bp.ring_hole.tolist() == [False, True]

    zone = crs.utm_zone(10.5)
    # project the ORIGINAL polygon into UTM space for the metric truth
    rings_m = []
    for r in range(len(pp.ring_start)):
        ring = pp.coords[pp.ring_start[r]:pp.ring_end[r]]
        e, n = crs.to_utm(ring[:, 0], ring[:, 1], zone)
        rings_m.append(np.stack([n, e], axis=1))
    pp_m = geo.PackedPolygons.from_latlng_rings(
        [[rings_m[0], rings_m[1]]], ["region"])

    rng = np.random.RandomState(3)
    la = rng.uniform(45.0, 58.0, 40000)
    lo = rng.uniform(3.0, 18.0, 40000)
    pe, pn = crs.to_utm(la, lo, zone)
    inside_orig = geo.points_in_polys(pn, pe, pp_m)
    dist_m = geo.points_to_boundary_deg(pn, pe, pp_m)
    want = inside_orig | (dist_m <= d_m)
    # evaluate the buffered polygon in the SAME projected space: like
    # geopandas to_crs, only vertices are reprojected, so a long edge is
    # straight in UTM, not in degrees (the reference shares this
    # vertex-only-projection semantics)
    br = []
    for r in range(len(bp.ring_start)):
        ring = bp.coords[bp.ring_start[r]:bp.ring_end[r]]
        e, n = crs.to_utm(ring[:, 0], ring[:, 1], zone)
        br.append(np.stack([n, e], axis=1))
    bp_m = geo.PackedPolygons(np.concatenate(br),
                              bp.ring_start, bp.ring_end,
                              bp.ring_poly, bp.ring_hole, bp.names)
    got = geo.points_in_polys(pn, pe, bp_m)
    # allow a sliver from the 12-deg arc discretization (points within
    # 0.6% of d of the boundary may fall either way)
    margin = np.abs(dist_m - d_m) < 0.006 * d_m
    agree = (got == want) | margin
    assert agree.mean() == 1.0, (~agree).sum()


def test_buffer_utm_vs_planar_close_at_midlat():
    """at mid-latitudes the planar-degree and UTM buffers agree to
    within a few percent of the buffer width (sanity tie between the
    two methods)."""
    shell = [(50.0, 8.0), (50.0, 11.0), (52.0, 11.0), (52.0, 8.0)]
    pp = geo.PackedPolygons.from_latlng_rings([[shell]], ["box"])
    d_m = 30_000.0
    b_utm = geo.buffer_polygon(pp, d_m, units="meters", method="utm")
    b_pl = geo.buffer_polygon(pp, d_m, units="meters", method="planar")
    rng = np.random.RandomState(11)
    la = rng.uniform(49.0, 53.0, 30000)
    lo = rng.uniform(6.5, 12.5, 30000)
    in_utm = geo.points_in_polys(la, lo, b_utm)
    in_pl = geo.points_in_polys(la, lo, b_pl)
    # methods differ only near the boundary (planar under-buffers in
    # the lng direction by cos(lat); the band is a few % of the box)
    assert (in_utm != in_pl).mean() < 0.10
    with pytest.raises(ValueError, match="method"):
        geo.buffer_polygon(pp, 1.0, method="nope")