"""Inverse-distance-weighted kNN interpolation of sparse points onto H3
cell centroids (SURVEY.md J5; loader-side capability of the reference:
NUM_NEIGHBOURS=3 geomesh.py:44, DEFAULT_NUM_NEIGHBORS=3 / DEFAULT_POWER=2
cli_geospatial.py:36-39, docs/README-geospatial.md:84-87).

value(cell) = sum(w_i * v_i) / sum(w_i),  w_i = 1 / d_i^power
over the k nearest data points within max_dist_km of the cell centroid.

Scale design: NO cross join. Both sides are bucketed on a latitude-banded
grid, points are exploded into their 3x3 neighbor buckets, the join is a
plain equi-join on (by, bx), and top-k is a window over (cell) ordered by
distance. Buckets co-partition the shuffle; AQE handles dense-city skew.
Fully SQL-expressible -> the whole plan stays in Tungsten codegen
(distance via built-in trig), which also makes it oracle-checkable in
DuckDB.

Coverage guarantee (round-3 fix of the >34-degree-latitude gap):

* latitude band ``by = floor(lat / pitch)`` with ``pitch =
  1.2 * max_dist_km / 111.32`` degrees.  A point within max_dist of a
  cell differs by at most ``pitch / 1.2`` degrees of latitude, so the
  point's band is within +-1 of the cell's band and the dy explode
  covers it.
* the longitude pitch is PER BAND.  For band ``by`` let ``e`` be the
  largest |latitude| any joined row can have (band edge + one band for
  the +-1 dy margin).  Haversine gives the exact bound
  ``sin(dlng/2) <= sin(d/2R) / cos(e)`` for two points within distance
  ``d`` at |lat| <= e, i.e. ``dlng <= 2*asin(sin(d/2R)/cos(e))``.  The
  band's longitude pitch is 1.2x that bound, so a true neighbor is
  always within +-1 longitude bucket and the dx explode covers it.  The
  old code used the equatorial pitch for both axes, which silently
  dropped due-east/west neighbors whenever ``cos(lat) < 1/1.2``
  (|lat| > 33.6 deg).
* near the poles (``sin(d/2R) >= 0.99 * cos(e)``) or once the bound
  exceeds 120 degrees, the band collapses to a single 360-degree
  bucket (bx is then -1 or 0 over raw longitude, still covered by the
  +-1 explode).  The 120-degree ceiling (not 360) keeps the wrap
  explode below collision range - see next point.

Antimeridian wrap (round-3 fix of the documented seam limitation): a
point within one band-pitch of lng=+-180 gets a second copy shifted by
-+360 degrees, so a cell on the other side of the seam finds it in its
own bucket neighborhood.  Haversine is computed from the SHIFTED
longitude, which is exact (sin((d+-360)/2 deg) differs only in sign).
The copy's buckets cannot collide with the original's: with pitch
< 120 the two bucket ranges are >= 3 apart, so no (cell, point) pair
is ever double-counted; bands whose pitch would be in [120, 360)
degenerate to the single 360-degree bucket instead, which is seam-
correct by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EARTH_R_KM = 6371.0088


def _lng_pitch_deg(by_col: Column, pitch_deg: float,
                   max_dist_km: float) -> Column:
    """Longitude bucket pitch (degrees) for latitude band ``by_col``.

    Exact per-band bound: dlng <= 2*asin(sin(d/2R)/cos(e)) where e is
    the extreme |lat| reachable by any row joined into this band (band
    edge + one band of dy margin).  1.2x safety, degenerate ->360.
    """
    e_deg = F.least(
        F.greatest(F.abs(by_col * F.lit(pitch_deg)),
                   F.abs((by_col + 1) * F.lit(pitch_deg)))
        + F.lit(pitch_deg),
        F.lit(90.0))
    cos_e = F.cos(F.radians(e_deg))
    half = math.sin(max_dist_km / (2.0 * _EARTH_R_KM))  # sin(d/2R)
    ratio = F.lit(half) / cos_e
    p = F.lit(1.2) * F.degrees(
        F.lit(2.0) * F.asin(F.least(ratio, F.lit(1.0))))
    # degenerate above 120 deg (not 360): guarantees the antimeridian
    # wrap copies land >= 3 buckets from their originals (no pair is
    # counted twice)
    return F.when((ratio >= F.lit(0.99)) | (p >= F.lit(120.0)),
                  F.lit(360.0)).otherwise(p)


def idw_interpolate(cells: DataFrame, points: DataFrame,
                    value_col: str | list[str],
                    k: int = 3, power: float = 2.0,
                    max_dist_km: float = 50.0,
                    cell_col: str = "h3_cell",
                    broadcast_cells: bool = False,
                    key_cols: list[str] | None = None) -> DataFrame:
    """cells: (cell_col, latitude, longitude); points: (latitude,
    longitude, value_col). Returns (cell_col, latitude, longitude,
    {value_col} interpolated, n_neighbors).

    key_cols: optional grouping columns present on BOTH sides (e.g.
    year/month time keys): they join the bucket equi-join key, the
    top-k window partition, and the output grouping, so one shuffle
    interpolates every time slice independently — no driver-side loop
    over slices (the YAML loader's `interval` semantics).

    broadcast_cells=True hints the cell side into a broadcast hash join:
    the (usually much larger) points side is never shuffled for the
    join, and the window + final aggregate then share ONE shuffle on
    cell_col (HashPartitioning(cell) satisfies both). Use when the cell
    grid is region-bounded (e.g. a country at res 5-7 is << executor
    memory); leave False to let AQE choose for unbounded grids."""
    pitch = max_dist_km / 111.32 * 1.2  # deg; >= max_dist in lat terms
    keys = list(key_cols or [])
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)

    pts = points.select(
        F.col("latitude").alias("p_lat"),
        F.col("longitude").alias("p_lng"),
        *[F.col(v).alias(f"p_val_{i}") for i, v in enumerate(vcols)],
        *keys)
    # antimeridian wrap: a point within one band-pitch of lng=+-180
    # gains a -+360-shifted copy so seam-crossing cells see it in their
    # bucket window; haversine from the shifted longitude is exact, and
    # the degenerate-at-120-deg pitch rule makes double-matching
    # impossible (module docstring).
    # trigger margin: the largest NON-degenerate pitch among the three
    # bands this point explodes into (a copy is useful exactly when
    # some candidate band buckets finer than 360 degrees and the point
    # sits within that band's pitch of the seam; degenerate bands are
    # served by the original, see the filter below)
    by0 = F.floor(F.col("p_lat") / F.lit(pitch))
    m = F.greatest(*[
        F.when(p < F.lit(360.0), p).otherwise(F.lit(0.0))
        for p in (_lng_pitch_deg(by0 + F.lit(d), pitch, max_dist_km)
                  for d in (-1, 0, 1))])
    shift = (F.when((m > F.lit(0.0))
                    & (F.col("p_lng") >= F.lit(180.0) - m),
                    F.lit(-360.0))
             .when((m > F.lit(0.0))
                   & (F.col("p_lng") <= F.lit(-180.0) + m),
                   F.lit(360.0)))
    pts = pts.withColumn(
        "__sh", F.explode(F.array_compact(
            F.array(F.lit(0.0), shift)))) \
        .withColumn("p_lng", F.col("p_lng") + F.col("__sh"))
    # explode points into their 3x3 neighborhood buckets (9x duplication of
    # the small side beats any theta-join); bx is computed against the
    # TARGET band's longitude pitch so the equi-join key matches the cell
    # side exactly.
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    pts = pts.withColumn(
        "off", F.explode(F.array(*[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy, dx in offs])))
    pts = pts.withColumn(
        "by", F.floor(F.col("p_lat") / F.lit(pitch)) + F.col("off.dy"))
    p_pitch = _lng_pitch_deg(F.col("by"), pitch, max_dist_km)
    # in a single-360-degree-bucket band the ORIGINAL row already
    # reaches every cell (bx in {-1, 0}, covered by the +-1 dx
    # explode); a wrap copy there would sit one bucket over and
    # double-match — drop copies in such bands
    pts = pts.filter((F.col("__sh") == 0) | (p_pitch < F.lit(360.0)))
    pts = pts.withColumn(
        "bx", F.floor(F.col("p_lng") / p_pitch) + F.col("off.dx")
    ).drop("off", "__sh")

    c = cells.alias("c").withColumn(
        "by", F.floor(F.col("c.latitude") / F.lit(pitch)))
    c_pitch = _lng_pitch_deg(F.col("by"), pitch, max_dist_km)
    c = c.withColumn("bx", F.floor(F.col("c.longitude") / c_pitch))
    if broadcast_cells:
        c = F.broadcast(c)
    j = c.join(pts, on=keys + ["by", "bx"], how="inner")
    # haversine distance in km (built-in trig only)
    la1 = F.radians(F.col("c.latitude"))
    la2 = F.radians(F.col("p_lat"))
    dla = la2 - la1
    dlo = F.radians(F.col("p_lng")) - F.radians(F.col("c.longitude"))
    h = (F.sin(dla / 2) ** 2
         + F.cos(la1) * F.cos(la2) * F.sin(dlo / 2) ** 2)
    j = j.withColumn(
        "dist_km", F.lit(2 * _EARTH_R_KM) * F.asin(F.sqrt(h)))
    j = j.filter(F.col("dist_km") <= F.lit(float(max_dist_km)))
    # a point can reach the same cell through more than one exploded
    # (dy,dx) copy only if the two copies land on the SAME (by,bx) --
    # impossible since the 9 offsets are distinct -- so no dedup needed.
    w = Window.partitionBy(cell_col, *keys).orderBy(
        F.col("dist_km").asc(), F.col("p_lat").asc(), F.col("p_lng").asc())
    j = j.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    # IDW weights; exact hits (dist ~ 0) dominate via epsilon clamp
    j = j.withColumn(
        "w", F.lit(1.0) / F.greatest(F.col("dist_km"),
                                     F.lit(1e-9)) ** F.lit(float(power)))
    out = j.groupBy(cell_col, "c.latitude", "c.longitude", *keys).agg(
        *[(F.sum(F.col("w") * F.col(f"p_val_{i}")) / F.sum("w")).alias(v)
          for i, v in enumerate(vcols)],
        F.count("*").alias("n_neighbors"))
    return out
