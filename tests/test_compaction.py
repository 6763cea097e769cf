"""Catalog small-file compaction tests (sources/catalog.py compact)."""

from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.sources.catalog import Catalog


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_compact_unpartitioned_preserves_rows_and_time_travel(
        spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    for b in range(5):  # five append snapshots -> many small files
        df = spark.range(b * 100, (b + 1) * 100, 1, 4).select(
            F.col("id"), (F.col("id") % 7).alias("v"))
        cat.write("t", df, mode="append" if b else "overwrite")
    man_before = cat.read_manifest("t")
    before = _rows(cat.load("t"))
    head_before = cat.current_snapshot("t")

    sid = cat.compact("t", target_bytes=1 << 30, min_files=2)
    assert sid == head_before + 1
    man_after = cat.read_manifest("t")
    assert man_after["mode"] == "compact"
    assert len(man_after["files"]) < len(man_before["files"])
    assert man_after["total_rows"] == man_before["total_rows"]
    assert _rows(cat.load("t")) == before
    # time travel: the pre-compaction snapshot still reads verbatim
    assert _rows(cat.load("t", snapshot=head_before)) == before
    # second pass: nothing left to compact
    assert cat.compact("t", target_bytes=1 << 30) is None


def test_compact_partitioned_groups_within_partitions(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    for b in range(3):
        df = spark.range(b * 60, (b + 1) * 60, 1, 3).select(
            F.col("id"), (F.col("id") % 2).alias("p"))
        cat.write("t", df, mode="append" if b else "overwrite",
                  partition_by=["p"])
    before = _rows(cat.load("t").select("id", "p"))
    n_files_before = len(cat.read_manifest("t")["files"])

    sid = cat.compact("t", target_bytes=1 << 30)
    assert sid is not None
    man = cat.read_manifest("t")
    assert len(man["files"]) < n_files_before
    # partition values survive the rewrite
    assert _rows(cat.load("t").select("id", "p")) == before
    parts = {tuple(sorted(f["partition"].items())) for f in man["files"]}
    assert parts == {(("p", "0"),), (("p", "1"),)}


def test_plan_respects_min_files_and_target(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    cat.write("t", spark.range(0, 50, 1, 1))  # one file only
    rewrite, keep = cat.plan_compaction("t", target_bytes=1 << 30,
                                        min_files=2)
    assert rewrite == [] and len(keep) == 1
    assert cat.compact("t", target_bytes=1 << 30) is None
    # big files are never rewritten
    cat.write("t", spark.range(50, 100, 1, 1), mode="append")
    rewrite, keep = cat.plan_compaction("t", target_bytes=10)  # tiny cap
    assert rewrite == [] and len(keep) == 2


def test_incremental_ingest_then_compact(spark, tmp_path):
    # the canonical small-file producer: repeated batch appends; the
    # maintenance pass shrinks file count without changing the corpus
    from osc_geo_h3grid_srv_spark.operators.incremental import (
        incremental_ingest)
    cat = Catalog(str(tmp_path / "wh"), spark)
    for b in range(4):
        batch = spark.range(b * 50, (b + 1) * 50, 1, 4).select(
            F.concat(F.lit("https://x/p"), F.col("id")).alias("url"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id"))
            .alias("warc_ts"))
        batch = batch.withColumn(
            "text", F.concat(F.lit("body "), F.col("url")))
        incremental_ingest(cat, batch, table="pages_raw",
                           batch_source=f"b{b}")
    before = _rows(cat.load("pages_raw").select("url"))
    n_before = len(cat.read_manifest("pages_raw")["files"])
    sid = cat.compact("pages_raw", target_bytes=1 << 30)
    assert sid is not None
    assert len(cat.read_manifest("pages_raw")["files"]) < n_before
    assert _rows(cat.load("pages_raw").select("url")) == before
    # a later batch still dedups against the compacted corpus
    import datetime
    dup = spark.createDataFrame(
        [("https://x/p0", datetime.datetime(2024, 1, 1),
          "body https://x/p0")],
        "url string, warc_ts timestamp, text string")
    rep = incremental_ingest(cat, dup, table="pages_raw",
                             batch_source="b-dup")
    assert rep["rows_appended"] == 0


def test_compact_aborts_on_concurrent_commit(spark, tmp_path):
    # lost-update guard (ADVICE r3): a writer that commits between
    # compaction planning and the manifest commit must abort the
    # compaction (its files would otherwise vanish from the new
    # snapshot). Simulated by appending mid-compaction via a hook on
    # _scan_files (runs after the rewrite, before the commit).
    import pytest

    cat = Catalog(str(tmp_path / "wh"), spark)
    for b in range(3):
        df = spark.range(b * 10, (b + 1) * 10, 1, 2).select(
            F.col("id"), (F.col("id") % 3).alias("v"))
        cat.write("t", df, mode="append" if b else "overwrite")
    head = cat.current_snapshot("t")
    real_scan = cat._scan_files

    def scan_and_race(staging):
        files = real_scan(staging)
        # restore BEFORE the racing write: write() itself scans its
        # staging dir, and a still-patched hook would recurse forever
        cat._scan_files = real_scan
        cat.write("t", spark.range(100, 110).select(
            F.col("id"), (F.col("id") % 3).alias("v")), mode="append")
        return files

    cat._scan_files = scan_and_race
    try:
        with pytest.raises(RuntimeError, match="concurrent commit"):
            cat.compact("t", target_bytes=1 << 30, min_files=2)
    finally:
        cat._scan_files = real_scan
    # the racing append's rows survive; nothing was lost or committed
    # on top of a stale parent
    assert cat.current_snapshot("t") == head + 1
    assert cat.load("t").count() == 40
