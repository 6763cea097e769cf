"""Salted equi-join (plans/skew.py): identical row multiset to the plain
join on a hot-key-skewed input, and the salted correlator path matches
the broadcast path row-for-row."""

from pyspark.sql import functions as F


def test_salted_join_parity(spark):
    # 90% of big rows share one hot key (a "Berlin cell")
    big = spark.range(0, 20000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("cell"))
    small = spark.createDataFrame(
        [("hot", 1.5), ("k7", 2.5), ("k13", 3.5)], "cell string, v double")

    from osc_geo_h3grid_srv_spark.plans.skew import salted_equi_join
    plain = big.join(small.withColumnRenamed("cell", "c2"),
                     big.cell == F.col("c2"), "inner")
    salted = salted_equi_join(big, small.withColumnRenamed("cell", "c2"),
                              "cell", "c2", salt=4, salt_src="id")
    a = sorted(tuple(r) for r in
               plain.select("id", "cell", "v").collect())
    b = sorted(tuple(r) for r in
               salted.select("id", "cell", "v").collect())
    assert a == b and len(a) >= 18000


def test_correlate_salted_matches_broadcast(engine, spark):
    import pandas as pd
    assets = spark.createDataFrame(pd.DataFrame({
        "id": ["a1", "a2", "a3"],
        "lat": [52.518, 50.95, 17.97],
        "long": [13.405, 6.95, -76.79]}))
    from osc_geo_h3grid_srv_spark.operators.correlate import correlate
    specs = [{"name": "flood_0010y", "filters": []}]
    bc = correlate(engine.catalog, assets, specs).orderBy("id").toPandas()
    sj = correlate(engine.catalog, assets, specs, broadcast_datasets=False,
                   salt=4).orderBy("id").toPandas()
    assert list(bc.columns) == list(sj.columns)
    assert bc.equals(sj[bc.columns])
