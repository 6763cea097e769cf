"""spark-submit entry for the END-TO-END media curation pipeline — the
multimodal composition the per-operator entries exercise piecewise:

    media_raw
      -> decode_stats ONE full REAL-decode pass (BMP/PPM/PNG/JPEG
                      dispatcher) materialized as media_stats
      -> decode_gate  filter over media_stats: rows that failed to
                      parse are quarantined into media_quarantine with
                      their error strings, good rows carry
                      parse-derived dims forward
      -> dedup        perceptual dHash -> banded Hamming join ->
                      connected components -> keep the FIRST doc_id per
                      visual cluster (re-hosted re-encodes collapse)
      -> thumbs       nearest-neighbor resize to a fixed thumbnail,
                      re-encoded as PPM (decodable output)
      -> features     payload byte-histogram vectors for the ANN /
                      embedding-dedup operators downstream

Every stage commits a snapshot manifest with input-snapshot lineage
(plans/pipeline.py), so a killed run resumes after its last committed
stage and appending new raw media invalidates exactly the downstream
stages. Launch:

    cd /root/repo && zip -qr /tmp/engine.zip osc_geo_h3grid_srv_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/curate_media_job.py --warehouse /tmp/media_wh --n-media 300
"""

from __future__ import annotations

import argparse
import json

THUMB_W, THUMB_H = 16, 12


def build_stages(max_hamming: int = 3):
    from pyspark.sql import functions as F

    from osc_geo_h3grid_srv_spark.operators.cluster import dedup_clusters
    from osc_geo_h3grid_srv_spark.operators.dedup import hamming_pairs
    from osc_geo_h3grid_srv_spark.operators.multimodal import (
        decode_pixel_stats, dhash_images, extract_features,
        resize_images)
    from osc_geo_h3grid_srv_spark.plans.pipeline import Stage

    def s_decode_stats(catalog, spark, media_raw):
        # the ONE full-decode pass: decode_gate and quarantine are
        # cheap filters over this materialized table (decoding twice
        # would double the pipeline's dominant CPU cost)
        return decode_pixel_stats(media_raw)

    def s_decode_gate(catalog, spark, media_raw, media_stats):
        good = media_stats.filter(F.col("error").isNull()).select(
            "doc_id", F.col("width").alias("parsed_w"),
            F.col("height").alias("parsed_h"), "channels")
        return (media_raw.join(good, "doc_id")
                .select("doc_id", "media_type", "parsed_w", "parsed_h",
                        "channels", "n_frames", "payload"))

    def s_quarantine(catalog, spark, media_stats):
        return media_stats.filter(F.col("error").isNotNull()) \
            .select("doc_id", "error")

    def s_dedup(catalog, spark, media_decoded):
        hashes = dhash_images(
            media_decoded.withColumnRenamed("parsed_w", "width")
            .withColumnRenamed("parsed_h", "height")) \
            .filter(F.col("dhash").isNotNull())
        pairs = hamming_pairs(hashes, "doc_id", "dhash",
                              max_hamming=max_hamming, salt=2)
        cc = dedup_clusters(hashes.select("doc_id"),
                            pairs.select("id_a", "id_b"))
        keep = cc.filter(F.col("doc_id") == F.col("cluster_rep")) \
            .select("doc_id")
        return media_decoded.join(keep, "doc_id", "left_semi")

    def s_thumbs(catalog, spark, media_dedup):
        return resize_images(
            media_dedup.withColumnRenamed("parsed_w", "width")
            .withColumnRenamed("parsed_h", "height"),
            THUMB_W, THUMB_H)

    def s_features(catalog, spark, media_dedup):
        return extract_features(media_dedup)

    return [
        Stage("decode_stats", ["media_raw"], "media_stats",
              s_decode_stats),
        Stage("decode_gate", ["media_raw", "media_stats"],
              "media_decoded", s_decode_gate),
        Stage("quarantine", ["media_stats"], "media_quarantine",
              s_quarantine),
        Stage("dedup", ["media_decoded"], "media_dedup", s_dedup),
        Stage("thumbs", ["media_dedup"], "media_thumbs", s_thumbs),
        Stage("features", ["media_dedup"], "media_features",
              s_features),
    ]


def synth_media_corpus(spark, n_media: int):
    """deterministic raw media: synth_phash_media triples (PGM/PNG/JPEG
    re-encodes of one picture — the dedup stage's planted work) plus a
    corrupt payload every 10th row (the quarantine stage's work)."""
    from pyspark.sql import functions as F

    from osc_geo_h3grid_srv_spark.operators.multimodal import (
        synth_phash_media)
    good = synth_phash_media(spark, n_media, partitions=8)
    bad = spark.range(0, max(n_media // 10, 1), 1, 2).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit("image").alias("media_type"),
        F.lit(0).cast("int").alias("width"),
        F.lit(0).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
        F.concat(F.lit(b"GARBAGE"),
                 F.col("id").cast("string").cast("binary"))
        .alias("payload"))
    return good.unionByName(bad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--n-media", type=int, default=300)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("curate-media")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    from osc_geo_h3grid_srv_spark.plans.pipeline import Pipeline
    from osc_geo_h3grid_srv_spark.sources.catalog import Catalog

    catalog = Catalog(args.warehouse, spark)
    if "media_raw" not in catalog.tables():
        catalog.write("media_raw",
                      synth_media_corpus(spark, args.n_media))

    pipe = Pipeline(catalog, build_stages())
    log = pipe.run(force=args.force)
    out = catalog.load("media_dedup")
    print(json.dumps({
        "stages": [{"stage": s, "action": a, "snapshot": sid}
                   for s, a, sid in log],
        "deduped_rows": out.count(),
        "quarantined": catalog.load("media_quarantine").count(),
        "thumbs": catalog.load("media_thumbs").count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
