"""Streaming exact deduplication of the page stream — the streaming
face of operators/dedup.exact_dedup, completing the webtext ingest
story: crawl batches land continuously, and only first-seen documents
flow downstream to the (batch-identical) index stages.

Built on dropDuplicatesWithinWatermark (the idiomatic Structured
Streaming dedup): the dedup key is the 16-byte md5 of the text — never
the payload — so the dedup state store holds one compact key per
distinct document seen within the watermark horizon, and Spark evicts
state older than the watermark. That eviction is the 100 TB contract:
state is bounded by (distinct docs per watermark window), not by
stream lifetime; a crawler that re-fetches a page weeks later re-emits
it, which is the standard trade (exact forever-dedup on an unbounded
stream is unbounded state by definition — that job belongs to the
batch compaction pass, operators/dedup.py + operators/cluster.py).

Rows are emitted immediately on first sight (append mode without
aggregation does not wait for the watermark), so dedup adds no
latency, only the state lookup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA


def stream_exact_dedup(spark, landing_dir: str, checkpoint_dir: str,
                       out_sink, dedup_col: str = "text",
                       ts_col: str = "warc_ts",
                       watermark: str = "1 hour",
                       available_now: bool = True):
    """landing pages -> md5(dedup_col) -> first-seen-only stream ->
    out_sink(batch_df, batch_id). Returns the started query."""
    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .option("maxFilesPerTrigger", 64).parquet(landing_dir))
    hashed = pages.withColumn("content_hash", F.md5(F.col(dedup_col)))
    deduped = (hashed.withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["content_hash"]))
    writer = (deduped.writeStream.outputMode("append")
              .foreachBatch(out_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
