"""Raster -> H3 tiling (SURVEY.md J6/A4): pixel grid -> cell assignment ->
per-cell min/max/median/mean, producing the flood-dataset column shape
(flood_risk_min/max/median/mean - the reference's example h3_index
datasets; deps rasterio/xarray pinned loader-side, requirements.txt:19-21).

The raster is modeled as a DataFrame of (row, col, latitude, longitude,
value) - a real GeoTIFF reader would mapInPandas window blocks into the
same shape. Aggregation is a single groupBy: Catalyst performs map-side
partial aggregation; median via percentile_approx(0.5) at scale or exact
median for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_udfs import cell_str, make_latlng_to_cell


def synth_raster(spark, lat0, lng0, n_rows, n_cols, pitch_deg,
                 partitions=32) -> DataFrame:
    """deterministic synthetic raster grid: value = f(row, col)."""
    df = spark.range(0, n_rows * n_cols, 1, partitions)
    df = df.select(
        (F.col("id") / n_cols).cast("long").alias("r"),
        (F.col("id") % n_cols).alias("c"))
    df = df.select(
        "r", "c",
        (F.lit(lat0) + F.col("r") * pitch_deg).alias("latitude"),
        (F.lit(lng0) + F.col("c") * pitch_deg).alias("longitude"),
        # smooth + hashy component, deterministic
        (F.sin(F.col("r") / 37.0) * F.cos(F.col("c") / 23.0) * 5.0
         + (F.xxhash64(F.col("r") * 100000 + F.col("c")) % 1000) / 1000.0
         ).alias("value"))
    return df


def raster_to_h3(raster: DataFrame, res: int, exact_median=True,
                 value_col="value", prefix="flood_risk") -> DataFrame:
    """per-cell min/max/median/mean at `res` + cell centroid lat/lng."""
    udf = make_latlng_to_cell(res)
    df = raster.withColumn(
        "cell", udf(F.col("latitude"), F.col("longitude")))
    median = (F.expr(f"median({value_col})") if exact_median
              else F.percentile_approx(value_col, 0.5))
    agg = df.groupBy("cell").agg(
        F.min(value_col).alias(f"{prefix}_min"),
        F.max(value_col).alias(f"{prefix}_max"),
        median.alias(f"{prefix}_median"),
        F.avg(value_col).alias(f"{prefix}_mean"),
    )
    from ..functions.spark_udfs import cell_lat, cell_lng
    return (agg
            .withColumn("h3_cell", cell_str(F.col("cell")))
            .withColumn("latitude", cell_lat(F.col("cell")))
            .withColumn("longitude", cell_lng(F.col("cell")))
            .drop("cell"))
