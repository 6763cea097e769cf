"""End-to-end media curation pipeline (jobs/curate_media_job.py):
decode gate + quarantine, perceptual dedup collapse, decodable thumbs,
all-skip resume, upstream-append invalidation."""

from pyspark.sql import functions as F

from jobs.curate_media_job import (THUMB_H, THUMB_W, build_stages,
                                   synth_media_corpus)
from osc_geo_h3grid_srv_spark.plans.pipeline import Pipeline
from osc_geo_h3grid_srv_spark.sources.catalog import Catalog


def test_media_pipeline_end_to_end(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    n = 90  # 30 visual triples + 9 corrupt rows
    cat.write("media_raw", synth_media_corpus(spark, n))
    pipe = Pipeline(cat, build_stages())
    log = pipe.run()
    assert all(a == "ran" for _, a, _ in log)
    # quarantine holds exactly the corrupt payloads
    quar = cat.load("media_quarantine").toPandas()
    assert len(quar) == 9
    assert (quar["doc_id"] >= 1_000_000).all()
    # decode gate kept all real images with parse-derived dims
    dec = cat.load("media_decoded")
    assert dec.count() == n
    assert dec.filter((F.col("parsed_w") == 64)
                      & (F.col("parsed_h") == 64)).count() == n
    # perceptual dedup collapses each triple to one representative
    dd = cat.load("media_dedup")
    n_dedup = dd.count()
    assert n_dedup <= n // 3 + 2  # triples collapse (rare band FPs may
    #                               merge neighboring groups)
    assert n_dedup >= n // 4
    # thumbs decode at the requested size
    from osc_geo_h3grid_srv_spark.functions.imagecodec import decode_image
    th = cat.load("media_thumbs").toPandas()
    assert len(th) == n_dedup
    for p in th["payload"].head(5):
        assert decode_image(bytes(p)).shape[:2] == (THUMB_H, THUMB_W)
    # features exist for every survivor
    assert cat.load("media_features").count() == n_dedup
    # all-skip resume
    log2 = Pipeline(cat, build_stages()).run()
    assert all(a == "skipped" for _, a, _ in log2)
    # appending a genuinely NEW picture invalidates downstream stages
    # and survives dedup (synth ids would reuse gid 0's raster and
    # collapse into its existing cluster — correct behavior, but not
    # what this assertion wants to see)
    import numpy as np
    import pandas as pd
    from osc_geo_h3grid_srv_spark.functions.imagecodec import encode_ppm
    rng = np.random.default_rng(123)
    fresh = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    more = spark.createDataFrame(pd.DataFrame(
        [(2_000_000, "image", 64, 64, 1, encode_ppm(fresh))],
        columns=["doc_id", "media_type", "width", "height",
                 "n_frames", "payload"])).select(
        F.col("doc_id").cast("long"), "media_type",
        F.col("width").cast("int"), F.col("height").cast("int"),
        F.col("n_frames").cast("int"), "payload")
    cat.write("media_raw", more, mode="append")
    log3 = Pipeline(cat, build_stages()).run()
    assert all(a == "ran" for _, a, _ in log3)
    assert cat.load("media_dedup").count() == n_dedup + 1
