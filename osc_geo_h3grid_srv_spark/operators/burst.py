"""Temporal burst detection: per-key z-scores of time-bucketed counts
against the trailing window — the standard first-pass trend/anomaly
signal over crawl telemetry (is this domain suddenly publishing 10x?),
query logs, and event streams; a relational simplification of the
state-machine burst models (Kleinberg, KDD 2002 — public literature).

Semantics (sparse-aware, deterministic):
* the stream collapses to exact integer counts per (key, bucket) —
  ONE map-side-combined groupBy, the only pass over the raw events;
* for each present bucket b, the trailing statistics are computed over
  the OBSERVED buckets in [b - trailing, b - 1] (a silent bucket
  contributes no row; interpret via `min_trailing`, which NULLs the
  z-score when fewer than that many trailing buckets exist);
* z = (c - mean) / sqrt(var_pop), NULL when var == 0 or history is
  short. mean/var derive from integer sum/sum-of-squares window
  aggregates, so both engines do the identical float arithmetic and
  the round(5) value-hash gate compares bit-identical doubles.

Scale shape: the window is a RANGE frame over the bucket index within
each key — after the count groupBy the relation is (key, bucket)-
grained, orders of magnitude smaller than the events; one exchange for
the groupBy, one for the per-key window sort of that SMALL relation.
No self-join, no explode of silent buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burst_zscores(events: DataFrame, key_col: str, ts_col: str,
                  bucket_s: float, trailing: int = 24,
                  min_trailing: int = 8) -> DataFrame:
    """-> (key_col, bucket, n, n_trail, z) per present (key, bucket);
    bucket = floor(epoch_us / bucket_s) (epoch-aligned); z NULL when
    fewer than min_trailing observed trailing buckets or zero
    variance."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s {bucket_s} must be > 0")
    if trailing <= 0:
        raise ValueError(f"trailing {trailing} must be > 0")
    if not 0 < min_trailing <= trailing:
        raise ValueError(
            f"min_trailing {min_trailing} not in 1..{trailing}")
    us = int(bucket_s * 1_000_000)
    counts = (events
              .filter(F.col(ts_col).isNotNull())
              .groupBy(F.col(key_col),
                       F.floor(F.unix_micros(
                           F.col(ts_col).cast("timestamp")) / us)
                       .alias("bucket"))
              .agg(F.count("*").cast("bigint").alias("n")))
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rangeBetween(-trailing, -1))
    stats = counts.select(
        key_col, "bucket", "n",
        F.count("*").over(w).cast("bigint").alias("n_trail"),
        F.sum("n").over(w).alias("_s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("_s2"))
    mean = F.col("_s") / F.col("n_trail")
    var = F.col("_s2") / F.col("n_trail") - mean * mean
    z = F.when(
        (F.col("n_trail") >= F.lit(min_trailing)) & (var > 0),
        (F.col("n") - mean) / F.sqrt(var))
    return stats.select(key_col, "bucket", "n", "n_trail",
                        (F.round(z, 5) + F.lit(0.0)).alias("z"))
