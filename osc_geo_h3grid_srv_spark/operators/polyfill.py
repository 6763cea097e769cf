"""Distributed polyfill for continent-scale regions (SURVEY.md F4 at
scale; VERDICT r01 next-step #10).

The driver-side `geo.polyfill` samples the region bbox at half-inradius
spacing — exact, but the sample grid is quadratic in region span /
cell size (a whole continent at res 7 needs ~70M samples and is
refused above `polyfill_candidates`' 20M cap). The distributed plan:

1. DRIVER (tiny): enumerate PARENT cells (res - 3 by default) over the
   bbox, prune to parents inside or within one parent-circumradius (+
   buffer) of the polygons — a conservative superset, so no fine cell
   can be lost.
2. EXECUTORS: explode parents across partitions; each task regenerates
   the fine sample grid ONLY around its parents, assigns res cells,
   keeps cells it OWNS (cell_to_parent == parent — a global dedup with
   no shuffle), then applies the exact centroid-in-polygon (+ buffer)
   test against the broadcast polygon set.

Union over parents equals the driver-path result exactly: every res
cell whose centroid passes has a parent within one parent circumradius
of the polygon (step 1 keeps it), and ownership keeps each cell exactly
once. At 10^12-row scale the same parent partitioning feeds the p{r}
partition layout, so polyfill output aligns with data placement.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import geo, h3core

# max circumradius of a cell at res r (km): the res-0 max edge scaled by
# sqrt(7) per level (h3core._EDGE_KM_RES0 geometry)
_EDGE_KM_RES0 = 1281.256011


def _circum_km(res: int) -> float:
    return _EDGE_KM_RES0 * (7.0 ** (-res / 2.0))


def estimate_driver_samples(packed: geo.PackedPolygons, res: int,
                            buffer_deg: float = 0.0) -> float:
    """sample-grid size the driver path would need (geo.polyfill)."""
    la_min, la_max, lo_min, lo_max = packed.bounds()
    la_min -= buffer_deg; la_max += buffer_deg
    lo_min -= buffer_deg; lo_max += buffer_deg
    step_lat = h3core.min_inradius_km(res) / 111.32 * 0.99
    max_abs = min(max(abs(la_min), abs(la_max)), 89.9)
    step_lng = step_lat / max(math.cos(math.radians(max_abs)), 0.02)
    return ((la_max - la_min) / step_lat + 2) * \
        ((lo_max - lo_min) / step_lng + 2)


def _children_in_polys(parent: int, res: int, parent_res: int, pp,
                       buffer_deg: float, world_clip: bool) -> np.ndarray:
    """all res-cells owned by `parent` whose centroid passes the polygon
    (+ buffer) test. Sample margin: parent circumradius * 1.3 + 2 child
    circumradii, so every owned cell contains a sample point."""
    p = np.array([parent], dtype=np.uint64)
    pla, plo = h3core.cell_to_latlng(p)
    margin_km = _circum_km(parent_res) * 1.3 + 2.0 * _circum_km(res)
    dla = margin_km / 111.32
    coslat = max(math.cos(math.radians(
        min(abs(float(pla[0])) + dla, 89.9))), 0.02)
    dlo = margin_km / (111.32 * coslat)
    step_lat = h3core.min_inradius_km(res) / 111.32 * 0.99
    step_lng = step_lat / coslat
    lats = np.arange(float(pla[0]) - dla, float(pla[0]) + dla, step_lat)
    lngs = np.arange(float(plo[0]) - dlo, float(plo[0]) + dlo, step_lng)
    LA, LO = np.meshgrid(lats, lngs, indexing="ij")
    cells = h3core.latlng_to_cell(LA.ravel(), LO.ravel(), res)
    cells = np.unique(cells)
    cells = cells[h3core.cell_to_parent(cells, parent_res) == parent]
    if cells.size == 0:
        return cells
    cla, clo = h3core.cell_to_latlng(cells)
    keep = np.ones(cells.shape[0], dtype=bool)
    if world_clip:
        keep &= (cla >= geo.MIN_LAT) & (cla <= geo.MAX_LAT)
    inside = geo.points_in_polys(cla, clo, pp)
    if buffer_deg > 0:
        inside |= geo.points_to_boundary_deg(cla, clo, pp) <= buffer_deg
    return cells[keep & inside]


def polyfill_distributed(spark, packed: geo.PackedPolygons, res: int,
                         buffer_deg: float = 0.0, world_clip: bool = True,
                         parent_res: int | None = None,
                         partitions: int | None = None) -> DataFrame:
    """distributed `geo.polyfill`: returns DataFrame(cell long), equal as
    a set to the driver path (int64 view of the uint64 cell ids)."""
    if parent_res is None:
        parent_res = max(res - 3, 0)
        # the driver-side parent enumeration must itself stay small
        while parent_res > 0 and estimate_driver_samples(
                packed, parent_res, buffer_deg) > 2_000_000:
            parent_res -= 1
    la_min, la_max, lo_min, lo_max = packed.bounds()
    la_min -= buffer_deg; la_max += buffer_deg
    lo_min -= buffer_deg; lo_max += buffer_deg
    if world_clip:
        la_min = max(la_min, geo.MIN_LAT)
        la_max = min(la_max, geo.MAX_LAT)
    if la_min > la_max:
        return spark.createDataFrame(pd.DataFrame({"cell": []}), "cell long")
    parents = h3core.polyfill_candidates(la_min, la_max, lo_min, lo_max,
                                         parent_res)
    # prune parents that cannot reach the polygons: centroid inside, or
    # within one parent circumradius (planar deg, lng-stretched) + buffer
    pla, plo = h3core.cell_to_latlng(parents)
    max_abs = min(float(np.abs(pla).max(initial=0.0)) + 1.0, 89.9)
    reach = (_circum_km(parent_res) * 1.3 / 111.32
             / max(math.cos(math.radians(max_abs)), 0.02)) + buffer_deg
    keep = geo.points_in_polys(pla, plo, packed) | \
        (geo.points_to_boundary_deg(pla, plo, packed) <= reach)
    parents = parents[keep]
    if parents.size == 0:
        return spark.createDataFrame(pd.DataFrame({"cell": []}), "cell long")
    bc = spark.sparkContext.broadcast(packed.to_arrays())
    n_part = partitions or max(
        min(int(parents.size), spark.sparkContext.defaultParallelism * 4), 1)
    pdf = pd.DataFrame({"parent": parents.view(np.int64)})
    df = spark.createDataFrame(pdf).repartition(n_part)

    def gen(batches):
        pp = geo.PackedPolygons(*bc.value)
        for b in batches:
            out = [np.empty(0, np.int64)]
            for parent in b["parent"].to_numpy().view(np.uint64):
                cells = _children_in_polys(int(parent), res, parent_res,
                                           pp, buffer_deg, world_clip)
                out.append(cells.view(np.int64))
            yield pd.DataFrame({"cell": np.concatenate(out)})

    return df.mapInPandas(gen, "cell long")


# auto-switch threshold: above this driver-grid size, enumerate_region_
# cells uses the distributed path (driver stays exact below it)
DRIVER_SAMPLE_LIMIT = 4_000_000
