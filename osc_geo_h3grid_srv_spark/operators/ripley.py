"""Ripley's K function — the classic second-order point-pattern
statistic (Ripley 1976, public spatial-statistics literature): for a
set of distance thresholds d, K̂(d) = A · 2·P(d) / (n·(n−1)) where
P(d) is the number of unordered point pairs within great-circle
distance d and A the study-area size. Values above π·d² indicate
clustering at range d, below indicate dispersion — the multi-scale
companion of the single-scale hotspot statistics (Gi*, Moran's I,
LISA) already in the suite.

Spark shape: ONE banded within-distance pair join at max(distances)
(operators/distjoin.py — candidates bounded by per-bucket density,
never n²), then a tiny explode of each surviving pair over the
|distances| thresholds and an integer count per threshold; n arrives
as a broadcast 1-row aggregate. Total shuffle: the bucket equi-join
plus a |distances|-row groupBy. The entry oracle replays the
UNPRUNED quadratic pair count in DuckDB, so a banding bound that
drops one true pair flips the value hash.

Edge correction is deliberately none (the raw/naive estimator):
callers on bounded windows should pass A of the actual study region;
the uncorrected estimator is the standard first tool and keeps the
statistic exactly replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.distjoin import (
    within_distance_pairs)


def ripleys_k(points: DataFrame, distances_km: list[float],
              area_km2: float, id_col: str = "id",
              lat_col: str = "lat",
              lng_col: str = "lng") -> DataFrame:
    """-> (d_km, n_pairs, k_hat round 4) for each threshold in
    distances_km (pairs compared on the round-4 distance the pair
    join emits, so the SQL replay is exact)."""
    ds = sorted(float(d) for d in distances_km)
    if not ds:
        raise ValueError("distances_km must be non-empty")
    if ds[0] <= 0:
        raise ValueError(f"distances {ds} must all be > 0")
    if area_km2 <= 0:
        raise ValueError(f"area_km2 {area_km2} must be > 0")
    # spread_probes: K's top threshold makes candidate volume >>
    # input size — the exact case the band-keyed repartition is for
    pairs = within_distance_pairs(points, ds[-1], id_col=id_col,
                                  lat_col=lat_col, lng_col=lng_col,
                                  spread_probes=True)
    thresholds = F.array(*[F.lit(d) for d in ds])
    hits = (pairs.select(F.explode(thresholds).alias("d_km"), "dist_km")
            .filter(F.col("dist_km") <= F.col("d_km"))
            .groupBy("d_km")
            .agg(F.count("*").cast("long").alias("n_pairs")))
    # thresholds with zero pairs must still surface (K̂ = 0 there)
    base = points.sparkSession.createDataFrame(
        [(d,) for d in ds], "d_km double")
    n_row = points.agg(F.count("*").cast("double").alias("__n"))
    out = (base.join(hits, "d_km", "left")
           .withColumn("n_pairs", F.coalesce("n_pairs", F.lit(0)))
           .crossJoin(F.broadcast(n_row)))
    k_hat = (F.lit(float(area_km2)) * 2.0 * F.col("n_pairs")
             / (F.col("__n") * (F.col("__n") - 1.0)))
    return out.select(
        "d_km", "n_pairs",
        (F.round(k_hat, 4) + F.lit(0.0)).alias("k_hat"))
