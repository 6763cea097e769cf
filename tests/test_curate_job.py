"""End-to-end corpus-curation pipeline (jobs/curate_corpus_job.py):
normalize -> dedup -> decontaminate -> mix -> shards over snapshot
checkpoints, with resume and upstream-invalidation semantics."""

import os

from pyspark.sql import functions as F

from jobs.curate_corpus_job import DEFAULT_MIX, build_stages, synth_corpus
from osc_geo_h3grid_srv_spark.plans.pipeline import Pipeline
from osc_geo_h3grid_srv_spark.sources.catalog import Catalog


def _setup(spark, tmp_path, n_docs=400):
    catalog = Catalog(str(tmp_path / "wh"), spark)
    catalog.write("corpus_raw", synth_corpus(spark, n_docs))
    # benchmark shares 4-grams with some corpus texts -> contamination
    catalog.write("benchmark_eval", spark.createDataFrame(
        [(1, "spark window batch value row hash table scan")],
        "bench_id long, text string"))
    return catalog


def test_curate_end_to_end_and_resume(spark, tmp_path):
    catalog = _setup(spark, tmp_path)
    pipe = Pipeline(catalog, build_stages(DEFAULT_MIX, n_shards=4))
    log = pipe.run()
    assert [a for _, a, _ in log] == ["ran"] * 5

    raw = catalog.load("corpus_raw")
    deduped = catalog.load("corpus_dedup")
    # planted exact dups (doc_id%17==1 copies doc_id-1) are gone:
    # exactly one survivor per identical text
    n_distinct_texts = catalog.load("corpus_clean") \
        .select("text").distinct().count()
    assert deduped.count() <= n_distinct_texts
    assert deduped.count() < raw.count()
    texts = deduped.groupBy("text").count().agg(F.max("count")) \
        .collect()[0][0]
    assert texts == 1  # no duplicate text survives

    # decontamination dropped the overlapping docs but not everything
    decon = catalog.load("corpus_decon")
    assert 0 < decon.count() < deduped.count() + 1

    # mix keeps only listed langs; shards partitioned on disk
    mix = catalog.load("corpus_mix")
    assert set(r["lang"] for r in mix.select("lang").distinct()
               .collect()) <= set(DEFAULT_MIX)
    shards = catalog.load("corpus_shards")
    assert shards.select("shard").distinct().count() == 4
    sdir = os.path.join(str(tmp_path / "wh"), "corpus_shards")
    data = [d for d in os.listdir(sdir) if d.startswith("data-")]
    assert any(e.startswith("shard=") for s in data
               for e in os.listdir(os.path.join(sdir, s)))

    # rerun: everything skipped (resume semantics)
    log2 = pipe.run()
    assert [a for _, a, _ in log2] == ["skipped"] * 5


def test_upstream_change_invalidates_downstream(spark, tmp_path):
    catalog = _setup(spark, tmp_path, n_docs=200)
    pipe = Pipeline(catalog, build_stages(DEFAULT_MIX, n_shards=4))
    pipe.run()
    before = catalog.load("corpus_shards").count()
    # append fresh raw docs -> every stage downstream of corpus_raw
    # must re-run, and the shard table must grow
    extra = synth_corpus(spark, 400).filter("doc_id >= 200")
    catalog.write("corpus_raw", extra, mode="append")
    log = pipe.run()
    assert [a for _, a, _ in log] == ["ran"] * 5
    after = catalog.load("corpus_shards").count()
    assert after > before


def test_deterministic_output_across_reruns(spark, tmp_path):
    c1 = _setup(spark, tmp_path / "a")
    Pipeline(c1, build_stages(DEFAULT_MIX, n_shards=4)).run()
    c2 = _setup(spark, tmp_path / "b")
    Pipeline(c2, build_stages(DEFAULT_MIX, n_shards=4)).run()
    a = sorted(map(tuple, c1.load("corpus_shards")
                   .select("doc_id", "shard", "pos").collect()))
    b = sorted(map(tuple, c2.load("corpus_shards")
                   .select("doc_id", "shard", "pos").collect()))
    assert a == b
