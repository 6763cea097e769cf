"""Shapefile repository (K5): register/unregister/inventory semantics of
reference repository.py:39-102 + load into engine polygons."""

import json
import os
import zipfile

import pytest

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
