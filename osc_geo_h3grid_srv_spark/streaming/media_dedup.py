"""Streaming perceptual image dedup — the streaming face of
multimodal.dhash_images + dropDuplicatesWithinWatermark, completing
the multimodal ingest story: media batches land continuously, each
payload is REALLY decoded (imagecodec/jpegcodec dispatcher) inside the
stream, and only first-seen-LOOKING images flow downstream.

The dedup key is the perceptual dHash, not the payload bytes, so two
different containers (PNG vs PGM vs a lossless-enough JPEG) of the
same picture collapse to one row — the behavior a crawl pipeline
wants, since the same image is re-hosted under endless re-encodes.
State is one 8-byte hash per distinct look within the watermark
horizon (same bounded-state contract as streaming/dedup.py; forever
near-dup matching at hamming > 0 belongs to the batch pass:
multimodal.dhash_images + dedup.hamming_pairs).

Undecodable payloads are NOT dropped: they flow through with a NULL
hash and their error string (quarantine), each distinct — corrupt
bytes must never alias each other out of the stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import MEDIA_SCHEMA, dhash_images


def stream_image_dedup(spark, landing_dir: str, checkpoint_dir: str,
                       out_sink, ts_col: str = "ingest_ts",
                       watermark: str = "1 hour",
                       available_now: bool = True):
    """landing media (MEDIA_SCHEMA + ingest_ts timestamp) -> real
    decode -> dHash -> first-seen-per-hash stream ->
    out_sink(batch_df, batch_id). Returns the started query."""
    media = (spark.readStream
             .schema(MEDIA_SCHEMA + f", {ts_col} timestamp")
             .option("maxFilesPerTrigger", 64).parquet(landing_dir))
    imgs = media.filter(F.col("media_type") == "image")
    # carry ts/payload THROUGH the hash stage rather than joining them
    # back on doc_id: a stream-stream self-join has no time bound, so
    # Spark would retain every row (payload bytes included) in join
    # state forever — the only stateful operator here must stay the
    # watermark-bounded dropDuplicatesWithinWatermark below
    hashed = dhash_images(imgs, carry_cols=(ts_col, "payload"))
    ok = (hashed.filter(F.col("dhash").isNotNull())
          .withWatermark(ts_col, watermark)
          .dropDuplicatesWithinWatermark(["dhash"]))
    bad = hashed.filter(F.col("dhash").isNull())
    out = ok.unionByName(bad)
    writer = (out.writeStream.outputMode("append")
              .foreachBatch(out_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
