"""Trajectory analytics over per-entity timestamped points — the
movement-side companions of the event-sequence rollups in funnel.py
(textbook mobility-mining semantics; no reference counterpart — the
reference indexes static points, it never orders them in time):

* trajectory_stats: per entity, traversed path length (sum of
  haversine steps between time-consecutive points), net displacement
  (first point -> last point), and the straightness ratio
  displacement/path — the standard gps-track summary.
* grid_stay_points: dwell detection on a lat/lng grid via
  gaps-and-islands — a stay is a maximal run of time-consecutive
  points in ONE grid cell with >= min_pts points and >= min_dwell_s
  between entry and exit. Pure window algebra (two row_numbers whose
  difference is the run id), no sequential scan.
* od_flows: origin-destination matrix — per (entity, day), the first
  and last grid cell define a trip; flows aggregate trips and
  distinct entities per (origin cell, destination cell).

Scale shape: every operator is entity-keyed — the only exchanges are
hash partitions on the entity id (plus one flow-cell groupBy), so
10^9 entities spread evenly and no per-entity data ever leaves its
partition between the window passes (Spark runs the two row_number
windows of grid_stay_points over ONE sort of the same exchange).
Ordering inside an entity is (ts, seq) with a caller-supplied unique
seq tie-break, so results are deterministic and exactly replayable
in SQL — the entry oracles run the identical window algebra in
DuckDB and value-hash the outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EARTH_R_KM = 6371.0088


def _hav_km(lat1, lng1, lat2, lng2):
    """haversine distance in km between two Column coordinate pairs —
    same formula + radius as operators/interpolate.py:172 (pure JVM
    trig, whole-stage codegen)."""
    la1, la2 = F.radians(lat1), F.radians(lat2)
    h = (F.sin((la2 - la1) / 2) ** 2
         + F.cos(la1) * F.cos(la2)
         * F.sin((F.radians(lng2) - F.radians(lng1)) / 2) ** 2)
    return F.lit(2 * _EARTH_R_KM) * F.asin(F.sqrt(h))


def trajectory_stats(points: DataFrame, id_col: str = "entity_id",
                     seq_col: str = "seq", ts_col: str = "ts",
                     lat_col: str = "lat",
                     lng_col: str = "lng") -> DataFrame:
    """-> (entity_id, n_points, path_km, displacement_km,
    straightness), rounded to 6 decimals; straightness is NULL for a
    zero-length path (single point or no net movement)."""
    w = Window.partitionBy(id_col).orderBy(ts_col, seq_col)
    stepped = points.select(
        F.col(id_col).alias("entity_id"),
        F.col(ts_col).alias("__ts"), F.col(seq_col).alias("__seq"),
        F.col(lat_col).alias("__lat"), F.col(lng_col).alias("__lng"),
        _hav_km(F.lag(lat_col).over(w), F.lag(lng_col).over(w),
                F.col(lat_col), F.col(lng_col)).alias("__step"))
    agg = stepped.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.coalesce(F.sum("__step"), F.lit(0.0)).alias("__path"),
        # first/last point by (ts, seq): struct min/max is ordered by
        # the unique (ts, seq) prefix, so the pick is deterministic
        F.min(F.struct("__ts", "__seq", "__lat", "__lng")).alias("__a"),
        F.max(F.struct("__ts", "__seq", "__lat", "__lng")).alias("__b"))
    disp = _hav_km(F.col("__a.__lat"), F.col("__a.__lng"),
                   F.col("__b.__lat"), F.col("__b.__lng"))
    return agg.select(
        "entity_id", "n_points",
        (F.round(F.col("__path"), 6) + F.lit(0.0)).alias("path_km"),
        (F.round(disp, 6) + F.lit(0.0)).alias("displacement_km"),
        (F.round(
            F.when(F.col("__path") > 0, disp / F.col("__path")), 6)
         + F.lit(0.0)).alias("straightness"))


def grid_stay_points(points: DataFrame, cell_deg: float,
                     min_pts: int = 3, min_dwell_s: float = 0.0,
                     id_col: str = "entity_id", seq_col: str = "seq",
                     ts_col: str = "ts", lat_col: str = "lat",
                     lng_col: str = "lng") -> DataFrame:
    """-> (entity_id, gx, gy, n_pts, enter_ts, exit_ts, dwell_s) for
    every maximal run of time-consecutive points of one entity inside
    one cell_deg x cell_deg grid cell, kept when the run has
    >= min_pts points and spans >= min_dwell_s seconds."""
    if cell_deg <= 0:
        raise ValueError(f"cell_deg {cell_deg} must be > 0")
    if min_pts < 1:
        raise ValueError(f"min_pts {min_pts} must be >= 1")
    p = points.select(
        F.col(id_col).alias("entity_id"),
        F.col(ts_col).alias("__ts"), F.col(seq_col).alias("__seq"),
        F.floor(F.col(lat_col) / F.lit(cell_deg)).alias("gx"),
        F.floor(F.col(lng_col) / F.lit(cell_deg)).alias("gy"))
    w_all = Window.partitionBy("entity_id").orderBy("__ts", "__seq")
    w_cell = Window.partitionBy("entity_id", "gx", "gy") \
        .orderBy("__ts", "__seq")
    runs = p.withColumn(
        "__run", F.row_number().over(w_all) - F.row_number().over(w_cell))
    out = runs.groupBy("entity_id", "gx", "gy", "__run").agg(
        F.count("*").cast("long").alias("n_pts"),
        F.min("__ts").alias("enter_ts"),
        F.max("__ts").alias("exit_ts"))
    dwell = ((F.unix_micros(F.col("exit_ts").cast("timestamp"))
              - F.unix_micros(F.col("enter_ts").cast("timestamp")))
             / F.lit(1e6))
    return (out.withColumn("dwell_s", F.round(dwell, 6) + F.lit(0.0))
            .filter((F.col("n_pts") >= F.lit(int(min_pts)))
                    & (F.col("dwell_s") >= F.lit(float(min_dwell_s))))
            .drop("__run"))


def od_flows(points: DataFrame, cell_deg: float,
             id_col: str = "entity_id", seq_col: str = "seq",
             ts_col: str = "ts", lat_col: str = "lat",
             lng_col: str = "lng") -> DataFrame:
    """-> (o_gx, o_gy, d_gx, d_gy, n_trips, n_entities): per
    (entity, utc day) the (ts, seq)-first point is the trip origin and
    the (ts, seq)-last point the destination; flows count trips and
    distinct entities per origin/destination cell pair (same-cell
    "trips" — no day movement — are kept: the diagonal is the stay
    mass every OD matrix carries)."""
    if cell_deg <= 0:
        raise ValueError(f"cell_deg {cell_deg} must be > 0")
    p = points.select(
        F.col(id_col).alias("entity_id"),
        F.col(ts_col).alias("__ts"), F.col(seq_col).alias("__seq"),
        F.date_trunc("day", F.col(ts_col).cast("timestamp"))
        .alias("__day"),
        F.floor(F.col(lat_col) / F.lit(cell_deg)).alias("__gx"),
        F.floor(F.col(lng_col) / F.lit(cell_deg)).alias("__gy"))
    trips = p.groupBy("entity_id", "__day").agg(
        F.min(F.struct("__ts", "__seq", "__gx", "__gy")).alias("__o"),
        F.max(F.struct("__ts", "__seq", "__gx", "__gy")).alias("__d"))
    return trips.groupBy(
        F.col("__o.__gx").alias("o_gx"), F.col("__o.__gy").alias("o_gy"),
        F.col("__d.__gx").alias("d_gx"), F.col("__d.__gy").alias("d_gy"),
    ).agg(F.count("*").cast("long").alias("n_trips"),
          F.count_distinct("entity_id").cast("long").alias("n_entities"))
