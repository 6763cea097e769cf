"""Streaming sitemap ingest -> frontier seeds — the streaming face of
sources/sitemap.py, closing the crawl-side loop: fetched sitemap
payloads land continuously, each is REALLY parsed inside the stream
(urlset + sitemapindex, quarantine on malformed bytes), and only
first-seen canonical URLs flow downstream as frontier seed rows.

The dedup key is the CANONICAL url (operators/weburl.py algebra:
tracking params collapse, host/scheme case-fold), so the same page
declared by several sitemaps — or re-declared on every refetch of the
same sitemap — seeds the frontier once per watermark horizon. State
is one compact key per distinct canonical url within the watermark
(same bounded-state contract as streaming/dedup.py); long-horizon
"have we ever crawled this" belongs to the batch-side incremental
ingest index, not stream state.

The fetch timestamp is CARRIED through the parse stage's mapInPandas
schema (sources/sitemap.py carry_cols), never joined back — a
stream-stream self-join has no time bound and would retain every
payload in join state forever (the round-4 media-dedup lesson).

Index files (<sitemapindex> children) are emitted on a separate
branch, not deduped against page URLs: the caller's fetcher feeds
those locs into the next sitemap fetch round. Quarantine rows pass
through unconditionally — corrupt fetches must never alias each other
out of the stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.weburl import canonicalize_url
from ..sources.sitemap import sitemap_urls

#: landing schema: one row per fetched sitemap payload
SITEMAP_LANDING_SCHEMA = ("sitemap_id long, fetch_ts timestamp, "
                          "payload binary")


def stream_sitemap_seeds(spark, landing_dir: str, checkpoint_dir: str,
                         out_sink, watermark: str = "1 hour",
                         available_now: bool = True):
    """landing sitemap fetches -> real parse -> first-seen canonical
    seed stream -> out_sink(batch_df, batch_id). The sink batch holds
    `kind` in {'seed', 'index', 'quarantine'}: seeds are deduped page
    URLs (canon, lastmod, changefreq, priority, fetch_ts), index rows
    are child-sitemap locs to fetch next, quarantine rows carry the
    parse error. Returns the started query."""
    raw = (spark.readStream.schema(SITEMAP_LANDING_SCHEMA)
           .option("maxFilesPerTrigger", 64).parquet(landing_dir))
    parsed = sitemap_urls(raw, carry_cols=("fetch_ts",))
    base = ["sitemap_id", "loc", "lastmod", "changefreq", "priority",
            "error", "fetch_ts"]
    seeds = (parsed.filter(F.col("error").isNull()
                           & ~F.col("is_index"))
             .withColumn("canon", canonicalize_url(F.col("loc")))
             .withWatermark("fetch_ts", watermark)
             .dropDuplicatesWithinWatermark(["canon"])
             .select(*base, "canon", F.lit("seed").alias("kind")))
    index = (parsed.filter(F.col("error").isNull() & F.col("is_index"))
             .select(*base, canonicalize_url(F.col("loc")).alias("canon"),
                     F.lit("index").alias("kind")))
    quar = (parsed.filter(F.col("error").isNotNull())
            .select(*base, F.lit(None).cast("string").alias("canon"),
                    F.lit("quarantine").alias("kind")))
    out = seeds.unionByName(index).unionByName(quar)
    writer = (out.writeStream.outputMode("append")
              .foreachBatch(out_sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
