"""spark-submit entry for incremental crawl ingest: append a new page
batch to the cataloged corpus, exact-deduplicated against everything
already ingested via the companion hash table (no corpus rescan).

Usage:
    cd /root/repo && zip -qr /tmp/engine.zip osc_geo_h3grid_srv_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/incremental_ingest_job.py \
        --warehouse /tmp/geomesh_wh --batch-path /data/crawl_0142.parquet \
        --batch-source crawl-0142

Re-running with the same --batch-source is a committed no-op; a run
killed between the data and hash commits is healed automatically by
the next run (manifest-diff reconciliation). Prints the ingest report
as one JSON line.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--batch-path", required=True,
                    help="parquet of (url, warc_ts, html, text, lang)")
    ap.add_argument("--batch-source", required=True,
                    help="stable batch id for idempotent re-runs")
    ap.add_argument("--table", default="pages_raw")
    ap.add_argument("--compact-target-bytes", type=int, default=0,
                    help="after the append, rewrite partitions whose "
                         "files are under this size into ~this-sized "
                         "outputs (0 = skip). Continuous ingest is the "
                         "canonical small-file producer; compaction "
                         "keeps scan cost bound to bytes, not file "
                         "count, without touching older snapshots.")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from osc_geo_h3grid_srv_spark.operators.incremental import (
        incremental_ingest)
    from osc_geo_h3grid_srv_spark.sources.catalog import Catalog

    spark = (SparkSession.builder
             .appName("osc-geo-h3grid-incremental-ingest")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    cat = Catalog(args.warehouse, spark)
    batch = spark.read.parquet(args.batch_path)
    report = incremental_ingest(cat, batch, table=args.table,
                                batch_source=args.batch_source)
    if args.compact_target_bytes > 0:
        sid = cat.compact(args.table,
                          target_bytes=args.compact_target_bytes)
        report["compacted_snapshot"] = sid
        report["files_after"] = len(cat.read_manifest(
            args.table)["files"])
    print(json.dumps(report))


if __name__ == "__main__":
    main()
