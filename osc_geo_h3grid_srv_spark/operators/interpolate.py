"""Inverse-distance-weighted kNN interpolation of sparse points onto H3
cell centroids (SURVEY.md J5; loader-side capability of the reference:
NUM_NEIGHBOURS=3 geomesh.py:44, DEFAULT_NUM_NEIGHBORS=3 / DEFAULT_POWER=2
cli_geospatial.py:36-39, docs/README-geospatial.md:84-87).

value(cell) = sum(w_i * v_i) / sum(w_i),  w_i = 1 / d_i^power
over the k nearest data points within max_dist_km of the cell centroid.

Scale design: NO cross join. Both sides are bucketed on an integer
lat/lng grid of pitch max_dist_km (the candidate bound), points are
exploded into their 3x3 neighbor buckets, the join is a plain equi-join
on the bucket id, and top-k is a window over (cell) ordered by distance.
Buckets co-partition the shuffle; AQE handles dense-city skew. Fully
SQL-expressible -> the whole plan stays in Tungsten codegen (distance via
built-in trig), which also makes it oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(lat_col, lng_col, pitch_deg):
    by = F.floor(lat_col / F.lit(pitch_deg))
    bx = F.floor(lng_col / F.lit(pitch_deg))
    return by, bx


def idw_interpolate(cells: DataFrame, points: DataFrame, value_col: str,
                    k: int = 3, power: float = 2.0,
                    max_dist_km: float = 50.0,
                    cell_col: str = "h3_cell",
                    broadcast_cells: bool = False) -> DataFrame:
    """cells: (cell_col, latitude, longitude); points: (latitude,
    longitude, value_col). Returns (cell_col, latitude, longitude,
    {value_col} interpolated, n_neighbors).

    broadcast_cells=True hints the cell side into a broadcast hash join:
    the (usually much larger) points side is never shuffled for the
    join, and the window + final aggregate then share ONE shuffle on
    cell_col (HashPartitioning(cell) satisfies both). Use when the cell
    grid is region-bounded (e.g. a country at res 5-7 is << executor
    memory); leave False to let AQE choose for unbounded grids."""
    pitch = max_dist_km / 111.32 * 1.2  # deg; >= max_dist in lat terms
    cy, cx = _bucket(F.col("c.latitude"), F.col("c.longitude"), pitch)

    pts = points.select(
        F.col("latitude").alias("p_lat"),
        F.col("longitude").alias("p_lng"),
        F.col(value_col).alias("p_val"))
    # explode points into their 3x3 neighborhood buckets (9x duplication of
    # the small side beats any theta-join)
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    pts = pts.withColumn(
        "off", F.explode(F.array(*[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy, dx in offs])))
    pts = pts.withColumn(
        "by", F.floor(F.col("p_lat") / F.lit(pitch)) + F.col("off.dy")
    ).withColumn(
        "bx", F.floor(F.col("p_lng") / F.lit(pitch)) + F.col("off.dx")
    ).drop("off")

    c = cells.alias("c").withColumn("by", cy).withColumn("bx", cx)
    if broadcast_cells:
        c = F.broadcast(c)
    j = c.join(pts, on=["by", "bx"], how="inner")
    # haversine distance in km (built-in trig only)
    la1 = F.radians(F.col("c.latitude"))
    la2 = F.radians(F.col("p_lat"))
    dla = la2 - la1
    dlo = F.radians(F.col("p_lng")) - F.radians(F.col("c.longitude"))
    h = (F.sin(dla / 2) ** 2
         + F.cos(la1) * F.cos(la2) * F.sin(dlo / 2) ** 2)
    j = j.withColumn(
        "dist_km", F.lit(2 * 6371.0088) * F.asin(F.sqrt(h)))
    j = j.filter(F.col("dist_km") <= F.lit(float(max_dist_km)))
    w = Window.partitionBy(cell_col).orderBy(
        F.col("dist_km").asc(), F.col("p_lat").asc(), F.col("p_lng").asc())
    j = j.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    # IDW weights; exact hits (dist ~ 0) dominate via epsilon clamp
    j = j.withColumn(
        "w", F.lit(1.0) / F.greatest(F.col("dist_km"),
                                     F.lit(1e-9)) ** F.lit(float(power)))
    out = j.groupBy(cell_col, "c.latitude", "c.longitude").agg(
        (F.sum(F.col("w") * F.col("p_val")) / F.sum("w")).alias(value_col),
        F.count("*").alias("n_neighbors"))
    return out
