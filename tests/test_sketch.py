"""HyperLogLog / Count-Min sketch tests (operators/sketch.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.sketch import (
    HLL_M, cms_point_estimates, cms_table, hll_estimate, hll_registers)


def _h32(s, salt):
    return int(hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:8], 16)


def _brute_registers(keys, salt="hll1"):
    regs = {}
    for k in keys:
        h = _h32(k, salt)
        b, rest = h >> 26, h & ((1 << 26) - 1)
        rho = 27 if rest == 0 else 27 - rest.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_brute(spark):
    keys = [f"key{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["bucket"]: r["rho"]
           for r in hll_registers(df, F.col("k")).collect()}
    assert got == _brute_registers(keys)


def test_hll_estimate_accuracy_and_merge(spark):
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    est = hll_estimate(hll_registers(df, F.col("k"))).collect()[0]
    rel = abs(est["hll_estimate"] - n) / n
    assert rel < 0.35, est  # m=64 -> ~13% std error; deterministic
    # registers merge by max: two halves -> same estimate as the whole
    h1 = hll_registers(df.filter("k < 'u45'"), F.col("k"))
    h2 = hll_registers(df.filter("k >= 'u45'"), F.col("k"))
    merged = (h1.unionByName(h2).groupBy("bucket")
              .agg(F.max("rho").alias("rho")))
    m_est = hll_estimate(merged).collect()[0]["hll_estimate"]
    assert m_est == pytest.approx(est["hll_estimate"], abs=1e-9)


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(10)],
                               "k string")
    est = hll_estimate(hll_registers(df, F.col("k"))).collect()[0]
    assert est["hll_estimate"] == pytest.approx(10, abs=1.5)


def test_cms_exact_when_uncrowded_and_one_sided(spark):
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    cms = cms_table(df, F.col("k"), d=4, w=512)
    got = {r["key"]: r["est"] for r in cms_point_estimates(
        cms, ["a", "b", "c", "nope"], d=4, w=512).collect()}
    # 3 keys in 512 buckets x 4 rows: some row is collision-free
    assert got["a"] == 7 and got["b"] == 3 and got["c"] == 1
    assert got["nope"] == 0


def test_cms_one_sided_under_collisions(spark):
    # w=2 forces collisions: estimates may exceed truth, never undercut
    rows = [(f"t{i % 20}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    cms = cms_table(df, F.col("k"), d=3, w=2)
    got = {r["key"]: r["est"] for r in cms_point_estimates(
        cms, [f"t{i}" for i in range(20)], d=3, w=2).collect()}
    for i in range(20):
        assert got[f"t{i}"] >= 20, i


def test_cms_merge_by_sum(spark):
    rows = [(i, f"w{i % 9}") for i in range(90)]
    df = spark.createDataFrame(rows, "i long, k string")
    whole = cms_table(df, F.col("k"))
    parts = (cms_table(df.filter("i < 40"), F.col("k"))
             .unionByName(cms_table(df.filter("i >= 40"), F.col("k")))
             .groupBy("row", "bucket")
             .agg(F.sum("total").cast("long").alias("total")))
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, parts.collect()))
    assert a == b


def test_cms_validation(spark):
    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError):
        cms_table(df, F.col("k"), d=0)


def test_bloom_no_false_negatives_and_merge(spark):
    import pyspark.sql.functions as F
    from osc_geo_h3grid_srv_spark.operators.sketch import (bloom_bits,
                                                           bloom_probe)
    a = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
    ba = bloom_bits(a, F.col("k"), k=4, m=4096)
    bb = bloom_bits(b, F.col("k"), k=4, m=4096)
    # every inserted key reports present (one-sided guarantee)
    got = {r["key"]: r["maybe_present"] for r in
           bloom_probe(ba, [f"k{i}" for i in range(50)]).collect()}
    assert all(got.values())
    # merge = union + distinct; merged filter sees both sides
    merged = ba.unionByName(bb).distinct()
    got2 = {r["key"]: r["maybe_present"] for r in
            bloom_probe(merged, ["k3", "m7"]).collect()}
    assert got2 == {"k3": True, "m7": True}
    # false-positive rate at this load (~400 set bits of 4096) is low:
    # most absent probes miss
    absent = [f"zz{i}" for i in range(40)]
    fp = sum(r["maybe_present"] for r in
             bloom_probe(merged, absent).collect())
    assert fp <= 4
    import pytest
    with pytest.raises(ValueError):
        bloom_bits(a, F.col("k"), k=0)
