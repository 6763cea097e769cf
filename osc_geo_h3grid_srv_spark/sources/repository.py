"""Shapefile repository — named polygon-bundle storage (SURVEY.md K5;
reference src/shape/repository.py:39-102 semantics, re-expressed).

The reference stores each registered shapefile as a directory (zip
extracted) under a repository root; register rejects duplicates,
unregister rejects unknown names, inventory lists directories. Same
contract here, plus `load(name)` which resolves the bundle into the
engine's polygon form (PackedPolygons via GeoJSON; a minimal `.geojson`
inside the bundle replaces the geopandas `.shp` reader that is not
available in this environment — SURVEY.md S4 decision).
"""

from __future__ import annotations

import os
import shutil
import zipfile


class ShapefileRepository:
    def __init__(self, repository: str):
        self.repository = repository
        os.makedirs(repository, exist_ok=True)

    def register(self, name: str, contents: str) -> dict:
        """extract the zip `contents` under the repository as `name`;
        duplicate names raise (reference repository.py:55-58)."""
        target = os.path.join(self.repository, name)
        if os.path.isdir(target):
            raise ValueError(
                f"Shapefile name:{name} already registered in the "
                f"repository:{self.repository}")
        with zipfile.ZipFile(contents, "r") as zf:
            zf.extractall(target)
        return {"status": "successful"}

    def unregister(self, name: str) -> dict:
        target = os.path.join(self.repository, name)
        if not os.path.exists(target):
            raise ValueError(
                f"Shapefile name:{name} is not registered in the "
                f"repository:{self.repository}")
        shutil.rmtree(target)
        return {"status": "successful"}

    def inventory(self) -> list:
        return [e for e in os.listdir(self.repository)
                if os.path.isdir(os.path.join(self.repository, e))]

    def load(self, name: str):
        """bundle -> PackedPolygons. Resolution order mirrors the
        reference's geopandas loader (shape.py:40): a real ESRI `.shp`
        (with its sibling `.dbf` names, parsed by sources/shapefile.py)
        wins; `.geojson`/`.json` is the fallback."""
        from ..functions import geo
        from .shapefile import packed_from_shapefile
        target = os.path.join(self.repository, name)
        if not os.path.isdir(target):
            raise ValueError(
                f"Shapefile name:{name} is not registered in the "
                f"repository:{self.repository}")
        geojson = None
        for dirpath, _, names in sorted(os.walk(target)):
            for n in sorted(names):
                if n.lower().endswith(".shp"):
                    return packed_from_shapefile(os.path.join(dirpath, n))
                if geojson is None and (n.endswith(".geojson")
                                        or n.endswith(".json")):
                    geojson = os.path.join(dirpath, n)
        if geojson is not None:
            return geo.PackedPolygons.from_geojson(geojson)
        raise ValueError(f"no .shp or geojson polygon file in "
                         f"bundle {name!r}")
