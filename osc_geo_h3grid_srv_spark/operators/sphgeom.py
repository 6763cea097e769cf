"""Geodesic ring statistics over a DISTRIBUTED vertex relation —
spherical area + perimeter for polygons stored as (region, seq, lat,
lng) rows, the shape a 10^9-polygon table actually has (the kernel
in functions/geo.py computes planar ring stats per packed polygon for
reference parity; this operator is its sphere-aware, DataFrame-native
twin for tables of rings too numerous to pack driver-side).

Area uses the spherical-trapezoid accumulation popularized by
turf.js / the Google Maps geometry library (public formula):
    area = |Σ_edges rad(λ2−λ1) · (2 + sin(rad φ1) + sin(rad φ2))|
           · R² / 2
exact for geodesic-edged polygons small relative to the sphere and
standard for web-mercator-scale features. Perimeter is the haversine
sum over edges. The ring closes implicitly (last vertex → first).

Plan shape: one region-keyed window pass (lead + first_value share
the sort) and one groupBy on the same exchange — identical to
trajectory_stats' shape, so it scales like any keyed aggregation;
no driver-side packing, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EARTH_R_KM = 6371.0088


def geodesic_ring_stats(rings: DataFrame, region_col: str = "region",
                        seq_col: str = "seq", lat_col: str = "lat",
                        lng_col: str = "lng") -> DataFrame:
    """-> (region, n_vertices, area_km2, perimeter_km), rounded to 4
    decimals. Vertices are ordered by seq_col within a region; each
    region is one ring (explode multi-ring shapes upstream)."""
    w = Window.partitionBy(region_col).orderBy(seq_col)
    wall = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    v = rings.select(
        F.col(region_col).alias("region"),
        F.col(lat_col).alias("__la1"), F.col(lng_col).alias("__lo1"),
        F.coalesce(F.lead(lat_col).over(w),
                   F.first(lat_col).over(wall)).alias("__la2"),
        F.coalesce(F.lead(lng_col).over(w),
                   F.first(lng_col).over(wall)).alias("__lo2"))
    term = (F.radians(F.col("__lo2") - F.col("__lo1"))
            * (F.lit(2.0) + F.sin(F.radians("__la1"))
               + F.sin(F.radians("__la2"))))
    la1, la2 = F.radians("__la1"), F.radians("__la2")
    h = (F.sin((la2 - la1) / 2) ** 2
         + F.cos(la1) * F.cos(la2)
         * F.sin(F.radians(F.col("__lo2") - F.col("__lo1")) / 2) ** 2)
    step = F.lit(2 * _EARTH_R_KM) * F.asin(F.sqrt(h))
    agg = v.groupBy("region").agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum(term).alias("__t"),
        F.sum(step).alias("__p"))
    area = F.abs(F.col("__t")) * (_EARTH_R_KM * _EARTH_R_KM / 2.0)
    return agg.select(
        "region", "n_vertices",
        (F.round(area, 4) + F.lit(0.0)).alias("area_km2"),
        (F.round("__p", 4) + F.lit(0.0)).alias("perimeter_km"))
