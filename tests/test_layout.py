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


def _py_xy2d(order, x, y):
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_parity_vs_python(spark):
    from osc_geo_h3grid_srv_spark.operators.layout import with_hilbert_key
    rng = np.random.default_rng(13)
    pts = [(int(a), int(b)) for a, b in
           zip(rng.integers(0, 1024, 400), rng.integers(0, 1024, 400))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = with_hilbert_key(df, F.col("x"), F.col("y"), 10).collect()
    for r in got:
        assert r.hd == _py_xy2d(10, r.x, r.y), (r.x, r.y)


def test_hilbert_is_a_bijection_with_unit_steps(spark):
    from osc_geo_h3grid_srv_spark.operators.layout import with_hilbert_key
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = [r.asDict() for r in
            with_hilbert_key(df, F.col("x"), F.col("y"), 4).collect()]
    rows = [type("R", (), {"x": r["x"], "y": r["y"], "d": r["hd"]})
            for r in rows]
    ds = sorted(r.d for r in rows)
    assert ds == list(range(256))  # bijection onto 0..255
    inv = {r.d: (r.x, r.y) for r in rows}
    # consecutive keys are 4-adjacent cells — the locality guarantee
    # Morton lacks (its max step on this grid is 16+)
    for i in range(255):
        (x1, y1), (x2, y2) = inv[i], inv[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    mort_inv = {_py_morton(x, y): (x, y) for x, y in pts}
    mort_steps = [abs(mort_inv[i][0] - mort_inv[i + 1][0])
                  + abs(mort_inv[i][1] - mort_inv[i + 1][1])
                  for i in range(255)]
    assert max(mort_steps) > 1  # morton does jump


def test_hilbert_validation(spark):
    from osc_geo_h3grid_srv_spark.operators.layout import (
        hilbert_spans, hilbert_sql_ctes, with_hilbert_key)
    df0 = spark.createDataFrame([(0, 0)], "x long, y long")
    with pytest.raises(ValueError):
        with_hilbert_key(df0, F.col("x"), F.col("y"), 0)
    with pytest.raises(ValueError):
        hilbert_sql_ctes("x", "y", "t", ["x"], 32)
    df = spark.createDataFrame([(1, 1)], "qx long, qy long")
    with pytest.raises(ValueError):
        hilbert_spans(df, F.col("qx"), F.col("qy"), 10, 63)
