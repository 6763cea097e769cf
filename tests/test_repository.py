"""Shapefile repository (K5): register/unregister/inventory semantics of
reference repository.py:39-102 + load into engine polygons; S4: real
ESRI .shp/.shx/.dbf bundles parsed by sources/shapefile.py."""

import json
import os
import zipfile

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.sources import shapefile as shpio
from osc_geo_h3grid_srv_spark.sources.repository import ShapefileRepository


def _bundle(tmp_path):
    gj = {"type": "Feature", "properties": {"name": "box"},
          "geometry": {"type": "Polygon", "coordinates":
                       [[[6.0, 47.0], [15.0, 47.0], [15.0, 55.0],
                         [6.0, 55.0], [6.0, 47.0]]]}}
    src = tmp_path / "region.geojson"
    src.write_text(json.dumps(gj))
    z = tmp_path / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(src, "region.geojson")
    return str(z)


def test_repository_lifecycle(tmp_path):
    repo = ShapefileRepository(str(tmp_path / "repo"))
    z = _bundle(tmp_path)
    assert repo.register("germany", z) == {"status": "successful"}
    with pytest.raises(ValueError, match="already registered"):
        repo.register("germany", z)
    assert repo.inventory() == ["germany"]

    pp = repo.load("germany")
    la_min, la_max, lo_min, lo_max = pp.bounds()
    assert (la_min, la_max, lo_min, lo_max) == (47.0, 55.0, 6.0, 15.0)

    assert repo.unregister("germany") == {"status": "successful"}
    with pytest.raises(ValueError, match="not registered"):
        repo.unregister("germany")
    assert repo.inventory() == []
    with pytest.raises(ValueError, match="not registered"):
        repo.load("germany")


_SHELL = [(47.0, 5.5), (49.5, 10.0), (47.0, 15.5), (52.0, 13.0),
          (55.5, 15.5), (55.5, 5.5), (51.0, 8.0)]
_HOLE = [(52.5, 9.0), (52.5, 10.5), (54.0, 10.5), (54.0, 9.0)]
_BOX = [(10.0, 20.0), (10.0, 24.0), (13.0, 24.0), (13.0, 20.0)]


def test_shp_write_read_roundtrip(tmp_path):
    """writer enforces spec winding (shell CW, hole CCW in x,y); reader
    recovers rings + hole flags + dbf names bit-for-bit on vertices."""
    recs = [[(_SHELL, False), (_HOLE, True)], [(_BOX, False)]]
    shpio.write_shapefile(recs, str(tmp_path / "regions"),
                          names=["concave", "box"])
    back = shpio.read_shp(str(tmp_path / "regions.shp"))
    assert len(back) == 2
    assert [h for _, h in back[0]] == [False, True]
    assert [h for _, h in back[1]] == [False]
    # closed-ring vertices match the input (up to closure + winding flip)
    got_shell = back[0][0][0]
    assert np.allclose(got_shell[0], got_shell[-1])  # closed
    assert {tuple(v) for v in got_shell.tolist()} == {
        tuple(map(float, v)) for v in _SHELL}
    names = [r["name"] for r in shpio.read_dbf(str(tmp_path / "regions.dbf"))]
    assert names == ["concave", "box"]


def test_shp_write_degenerate_rings(tmp_path):
    """ADVICE r02: a record whose rings all collapse (<3 points, e.g.
    simplify with a huge tolerance) becomes an ESRI Null shape instead
    of a numpy zero-size crash; all-degenerate input raises clearly."""
    import pytest
    recs = [[([(47.0, 5.5), (47.5, 6.0)], False)], [(_BOX, False)]]
    shpio.write_shapefile(recs, str(tmp_path / "deg"), names=["bad", "ok"])
    back = shpio.read_shp(str(tmp_path / "deg.shp"))
    assert len(back) == 2
    assert back[0] == []  # Null shape
    assert [h for _, h in back[1]] == [False]
    with pytest.raises(ValueError, match="no non-degenerate rings"):
        shpio.write_shapefile([[([(1.0, 2.0)], False)]],
                              str(tmp_path / "empty"), names=["x"])
    with pytest.raises(ValueError, match="no non-degenerate rings"):
        shpio.write_shapefile([], str(tmp_path / "none"), names=[])


def test_shp_packed_matches_geojson_path(tmp_path):
    """PackedPolygons from a real .shp must be semantically identical to
    the GeoJSON load of the same geometry: same PIP answers, same
    polyfill cells."""
    from osc_geo_h3grid_srv_spark.functions import geo
    recs = [[(_SHELL, False), (_HOLE, True)]]
    shpio.write_shapefile(recs, str(tmp_path / "region"), names=["region"])
    pp_shp = shpio.packed_from_shapefile(str(tmp_path / "region.shp"))
    pp_gj = geo.PackedPolygons.from_latlng_rings([[_SHELL, _HOLE]],
                                                 ["region"])
    assert pp_shp.names == ["region"]
    rng = np.random.RandomState(7)
    la = rng.uniform(45.0, 57.0, 4000)
    lo = rng.uniform(4.0, 17.0, 4000)
    got = geo.points_in_polys(la, lo, pp_shp)
    want = geo.points_in_polys(la, lo, pp_gj)
    assert (got == want).all() and want.any()
    cells_shp = set(geo.polyfill(pp_shp, 5).tolist())
    cells_gj = set(geo.polyfill(pp_gj, 5).tolist())
    assert cells_shp == cells_gj and cells_shp


def test_shp_utm_prj_auto_transform(tmp_path):
    """a .shp whose .prj declares a UTM zone reprojects to EPSG:4326 on
    load (the reference's transform_to_epsg_4326, shape.py:278-290)."""
    from osc_geo_h3grid_srv_spark.functions import crs, geo
    # build a UTM-coordinate shapefile for the concave region: store
    # (lat=northing, lng=easting) ring coords + a zone-33N prj
    zone = 33
    rings = []
    for ring, hole in ((_SHELL, False), (_HOLE, True)):
        arr = np.asarray(ring, dtype=np.float64)
        e, n = crs.to_utm(arr[:, 0], arr[:, 1], zone)
        rings.append((np.stack([n, e], axis=1), hole))
    base = str(tmp_path / "utm_region")
    shpio.write_shapefile(
        [rings], base, names=["region"],
        prj_wkt='PROJCS["WGS 84 / UTM zone 33N",AUTHORITY["EPSG","32633"]]')
    pp = shpio.packed_from_shapefile(base + ".shp")
    want = geo.PackedPolygons.from_latlng_rings([[_SHELL, _HOLE]],
                                                ["region"])
    assert pp.ring_hole.tolist() == [False, True]

    def same_region(a, b):
        # vertex order may be re-wound to spec; compare geometrically
        rng = np.random.RandomState(5)
        la = rng.uniform(45.0, 57.0, 3000)
        lo = rng.uniform(4.0, 17.0, 3000)
        ina, inb = (geo.points_in_polys(la, lo, a),
                    geo.points_in_polys(la, lo, b))
        return (ina == inb).all() and inb.any()

    assert same_region(pp, want)
    # the shell reaches 9.5 deg from the zone-33 central meridian, where
    # the Snyder series is ~2 m off — tolerance 1e-4 deg (~11 m)
    assert np.abs(np.sort(pp.coords, axis=0)
                  - np.sort(want.coords, axis=0)).max() < 1e-4
    # ESRI-style prj spelling also parses
    with open(base + ".prj", "w") as fh:
        fh.write('PROJCS["x",PROJECTION["Transverse_Mercator"],'
                 'ATTR["UTM_Zone_33N"]]')
    pp2 = shpio.packed_from_shapefile(base + ".shp")
    assert same_region(pp2, want)
    # unrecognized CRS is an error, not silent garbage
    with open(base + ".prj", "w") as fh:
        fh.write('PROJCS["Lambert_Conformal_Conic stuff"]')
    with pytest.raises(ValueError, match="unsupported CRS"):
        shpio.packed_from_shapefile(base + ".shp")


def test_repository_shp_only_bundle(tmp_path):
    """VERDICT r01 done-criterion: a zip containing ONLY .shp/.shx/.dbf
    resolves through ShapefileRepository.load."""
    base = str(tmp_path / "ger")
    shpio.write_shapefile([[(_SHELL, False), (_HOLE, True)]], base,
                          names=["germanyish"])
    z = tmp_path / "shp_bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for ext in (".shp", ".shx", ".dbf"):
            zf.write(base + ext, "ger" + ext)
    repo = ShapefileRepository(str(tmp_path / "repo2"))
    repo.register("germanyish", str(z))
    pp = repo.load("germanyish")
    assert pp.names == ["germanyish"]
    la_min, la_max, lo_min, lo_max = pp.bounds()
    assert (la_min, la_max) == (47.0, 55.5)
    assert (lo_min, lo_max) == (5.5, 15.5)
    assert int(pp.ring_hole.sum()) == 1
