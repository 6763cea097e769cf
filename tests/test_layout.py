"""Z-order layout keys (operators/layout.py): exact python morton
parity, locality property vs row-major striping, and the
range-partitioned write path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.layout import (
    layout_by_zorder, morton_key_2d, zorder_spans)


def _py_morton(x, y):
    def spread(v):
        v &= 0xFFFF
        for sh, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F),
                         (2, 0x33333333), (1, 0x55555555)]:
            v = (v | (v << sh)) & mask
        return v
    return spread(x) | (spread(y) << 1)


def test_morton_parity_vs_python(spark):
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 1 << 16, 500)
    ys = rng.integers(0, 1 << 16, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long")
    got = df.select(
        "x", "y", morton_key_2d(F.col("x"), F.col("y")).alias("k")
    ).collect()
    for r in got:
        assert r.k == _py_morton(r.x, r.y), (r.x, r.y)


def test_morton_bit_structure(spark):
    # interleave property: morton(x, 0) has bits only at even
    # positions, morton(0, y) only at odd; xy-interleave is their OR
    df = spark.createDataFrame([(0b1011, 0b0110)], "x long, y long")
    r = df.select(
        morton_key_2d(F.col("x"), F.lit(0)).alias("mx"),
        morton_key_2d(F.lit(0), F.col("y")).alias("my"),
        morton_key_2d(F.col("x"), F.col("y")).alias("mxy")).collect()[0]
    assert r.mx == 0b01000101          # x bits 0,1,3 -> even pos 0,2,6
    assert r.my == 0b00101000          # y bits 1,2 -> odd pos 3,5
    assert r.mxy == r.mx | r.my


def test_zorder_locality_beats_row_major(spark):
    # 64x64 uniform grid, 64 buckets either by z-order key or by
    # row-major stripes: z-order buckets must have far smaller
    # bounding boxes (the file-pruning property)
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "qx long, qy long")
    z = zorder_spans(df, F.col("qx"), F.col("qy"),
                     bucket_shift=6).collect()
    assert len(z) == 64
    # every z-bucket is an exact 8x8 block (same AREA as a 1x64
    # row-major stripe, but bounded in BOTH dimensions — that is the
    # pruning property)
    assert all(r.x_max - r.x_min == 7 and r.y_max - r.y_min == 7
               for r in z)
    assert all(r.n == 64 for r in z)  # balanced buckets too
    # an 8x8 range query [16..23]^2 overlaps exactly ONE z-bucket's
    # bbox; under row-major striping (bucket = qx) it overlaps 8
    z_hit = sum(1 for r in z
                if r.x_min <= 23 and r.x_max >= 16
                and r.y_min <= 23 and r.y_max >= 16)
    assert z_hit == 1
    rm_hit = sum(1 for x in range(64) if 16 <= x <= 23)
    assert rm_hit == 8


def test_layout_write_partitions_are_key_ranges(spark, tmp_path):
    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in
         zip(rng.integers(0, 1024, 2000), rng.integers(0, 1024, 2000))],
        "qx long, qy long")
    out = layout_by_zorder(df, F.col("qx"), F.col("qy"), 8)
    path = str(tmp_path / "zorder")
    out.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()).withColumn(
        "k", morton_key_2d(F.col("qx"), F.col("qy")))
    spans = (back.groupBy("f")
             .agg(F.min("k").alias("lo"), F.max("k").alias("hi"),
                  F.count("*").alias("n")).collect())
    ivs = sorted((r.lo, r.hi) for r in spans if r.n > 0)
    assert len(ivs) >= 4
    for (l1, h1), (l2, h2) in zip(ivs, ivs[1:]):
        assert h1 <= l2, "file key ranges must not overlap"
    with pytest.raises(ValueError):
        layout_by_zorder(df, F.col("qx"), F.col("qy"), 0)
    with pytest.raises(ValueError):
        zorder_spans(df, F.col("qx"), F.col("qy"), -1)
