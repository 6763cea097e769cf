"""spark-submit entry for the END-TO-END training-corpus curation
pipeline — the composition the per-operator entries exercise piecewise:

    corpus_raw
      -> normalize     unicode cleanup (shuffle-free projection)
      -> dedup         exact (md5 keep-first) + MinHash-LSH near-dup
                       clusters, keep-best-quality survivor per cluster
      -> decontaminate drop docs overlapping the benchmark gram set
      -> mix           deterministic per-lang stratified sampling
      -> shards        reproducible global shuffle + shard assignment,
                       written partitioned by shard

Every stage commits a snapshot manifest with input-snapshot lineage
(plans/pipeline.py), so a killed run resumes after its last committed
stage and appending new raw docs invalidates exactly the downstream
stages. Launch:

    cd /root/repo && zip -qr /tmp/engine.zip osc_geo_h3grid_srv_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/curate_corpus_job.py --warehouse /tmp/curate_wh \
        --n-docs 5000
"""

from __future__ import annotations

import argparse
import json


def build_stages(mix_fractions: dict, n_shards: int,
                 contam_threshold: float = 0.2,
                 minhash_threshold: float = 0.7):
    from pyspark.sql import functions as F

    from osc_geo_h3grid_srv_spark.functions.text import normalize_text_expr
    from osc_geo_h3grid_srv_spark.operators.cluster import (
        dedup_clusters, dedup_keep_decision)
    from osc_geo_h3grid_srv_spark.operators.decontaminate import (
        contamination_stats)
    from osc_geo_h3grid_srv_spark.operators.dedup import (
        exact_dedup, minhash_lsh_pairs)
    from osc_geo_h3grid_srv_spark.operators.packing import assign_shards
    from osc_geo_h3grid_srv_spark.operators.quality import (
        quality_classifier)
    from osc_geo_h3grid_srv_spark.operators.sampling import stratified_mix
    from osc_geo_h3grid_srv_spark.plans.pipeline import Stage

    def s_normalize(catalog, spark, corpus_raw):
        return corpus_raw.select(
            "doc_id", "lang", "source",
            normalize_text_expr(F.col("text")).alias("text"))

    def s_dedup(catalog, spark, corpus_clean):
        docs = corpus_clean
        # exact: keep the minimal id per identical text
        survivors = exact_dedup(docs, "doc_id", "text") \
            .select("doc_id")
        docs = docs.join(survivors, "doc_id", "left_semi")
        # near-dup: LSH candidate pairs -> connected components ->
        # keep the best-quality doc per cluster
        pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                                  threshold=minhash_threshold)
        clustered = dedup_clusters(docs, pairs)
        q = quality_classifier(docs).select("doc_id", "quality_score")
        decided = dedup_keep_decision(
            clustered.join(q, "doc_id"), "quality_score")
        keep = decided.filter("keep").select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")

    def s_decontaminate(catalog, spark, corpus_dedup, benchmark_eval):
        stats = contamination_stats(corpus_dedup, benchmark_eval,
                                    threshold=contam_threshold)
        clean = stats.filter(F.col("is_contaminated") == 0) \
            .select("doc_id")
        return corpus_dedup.join(clean, "doc_id", "left_semi")

    def s_mix(catalog, spark, corpus_decon):
        return stratified_mix(corpus_decon, "lang", mix_fractions,
                              "doc_id")

    def s_shards(catalog, spark, corpus_mix):
        return assign_shards(corpus_mix, n_shards)

    return [
        Stage("normalize", ["corpus_raw"], "corpus_clean", s_normalize),
        Stage("dedup", ["corpus_clean"], "corpus_dedup", s_dedup),
        Stage("decontaminate", ["corpus_dedup", "benchmark_eval"],
              "corpus_decon", s_decontaminate),
        Stage("mix", ["corpus_decon"], "corpus_mix", s_mix),
        Stage("shards", ["corpus_mix"], "corpus_shards", s_shards,
              partition_by=["shard"]),
    ]


DEFAULT_MIX = {"en": 1.0, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.5}


def synth_corpus(spark, n_docs):
    """deterministic raw corpus with planted exact dups (doc_id%17==1
    copies doc_id-1's text) and unicode junk for the normalize stage."""
    from pyspark.sql import functions as F
    base = spark.range(0, n_docs, 1, 16).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(*[F.lit(x) for x in
                               ("en", "en", "de", "fr", "es", "zh")]),
                     (F.col("id") % 6 + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"))
    words = ["table", "scan", "merge", "query", "spark", "window",
             "batch", "value", "row", "hash"]
    warr = F.array(*[F.lit(w) for w in words])
    text = F.concat_ws(
        " ",
        *[F.element_at(warr, ((F.col("doc_id") * p + i) % 10 + 1)
                       .cast("int"))
          for i, p in enumerate((3, 7, 11, 13, 17, 19, 23, 29))])
    # a per-doc distinguishing token: without it every text collapses
    # to one of 10 patterns (words depend only on doc_id % 10) and the
    # dedup stage would erase the corpus. lcm(101, 10) > any test size,
    # so texts are unique except the planted copies.
    text = F.concat(text, F.lit(" u"),
                    (F.col("doc_id") % 101).cast("string"))
    base = base.withColumn("text_own", text)
    prev = F.concat_ws(
        " ",
        *[F.element_at(warr, (((F.col("doc_id") - 1) * p + i) % 10 + 1)
                       .cast("int"))
          for i, p in enumerate((3, 7, 11, 13, 17, 19, 23, 29))])
    prev = F.concat(prev, F.lit(" u"),
                    ((F.col("doc_id") - 1) % 101).cast("string"))
    return base.select(
        "doc_id", "lang", "source",
        F.when(F.col("doc_id") % 17 == 1, prev)
        .otherwise(F.col("text_own")).alias("text"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("curate-corpus")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    from osc_geo_h3grid_srv_spark.plans.pipeline import Pipeline
    from osc_geo_h3grid_srv_spark.sources.catalog import Catalog

    catalog = Catalog(args.warehouse, spark)
    if "corpus_raw" not in catalog.tables():
        catalog.write("corpus_raw", synth_corpus(spark, args.n_docs))
    if "benchmark_eval" not in catalog.tables():
        bench = spark.createDataFrame(
            [(1, "spark window batch value row hash table scan")],
            "bench_id long, text string")
        catalog.write("benchmark_eval", bench)

    pipe = Pipeline(catalog, build_stages(DEFAULT_MIX, args.n_shards))
    log = pipe.run(force=args.force)
    out = catalog.load("corpus_shards")
    print(json.dumps({
        "stages": [{"stage": s, "action": a, "snapshot": sid}
                   for s, a, sid in log],
        "final_rows": out.count(),
        "n_shards_seen": out.select("shard").distinct().count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
