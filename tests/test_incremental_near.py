"""Incremental near-dup ingest (operators/incremental_near.py):
batches dedup against the persistent banded-signature index without
re-signaturing the corpus; crash between the two commits heals;
re-running a batch is a no-op."""

import datetime

import pandas as pd
import pytest

from osc_geo_h3grid_srv_spark.operators.incremental_near import (
    _sig_table, incremental_near_ingest)
from osc_geo_h3grid_srv_spark.sources.catalog import Catalog

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "pelicans watch from the harbor wall near the old lighthouse "
        "keeper cottage garden gate")


def _pages(spark, rows):
    """rows: list of (url, ts_str, text)."""
    pdf = pd.DataFrame({
        "url": [r[0] for r in rows],
        "warc_ts": [pd.Timestamp(r[1]) for r in rows],
        "text": [r[2] for r in rows]})
    return spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, text string")


def _variant(i):
    """text near-identical to BASE (one token appended)."""
    return BASE + f" extra{i}"


def _distinct(i):
    words = [f"w{i}x{j}" for j in range(30)]
    return " ".join(words)


def test_near_ingest_end_to_end(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    r1 = incremental_near_ingest(cat, _pages(spark, [
        ("https://a/1", "2024-01-01 00:00", BASE),
        ("https://a/2", "2024-01-01 00:01", _distinct(1)),
    ]), table="pages", batch_source="b1")
    assert r1["rows_appended"] == 2
    # batch 2: a near-variant of BASE (drops), an exact re-ingest
    # (drops), a fresh doc (kept), and an intra-batch near pair
    # (later one drops)
    r2 = incremental_near_ingest(cat, _pages(spark, [
        ("https://b/1", "2024-01-02 00:00", _variant(1)),
        ("https://b/2", "2024-01-02 00:01", _distinct(1)),
        ("https://b/3", "2024-01-02 00:02", _distinct(2)),
        ("https://b/4", "2024-01-02 00:03", _distinct(3)),
        ("https://b/5", "2024-01-02 00:04", _distinct(3) + " tail"),
    ]), table="pages", batch_source="b2")
    assert r2["rows_appended"] == 2
    urls = {r["url"] for r in cat.load("pages").select("url").collect()}
    assert urls == {"https://a/1", "https://a/2", "https://b/3",
                    "https://b/4"}
    # idempotent re-run
    r2b = incremental_near_ingest(cat, _pages(spark, [
        ("https://b/3", "2024-01-02 00:02", _distinct(2)),
    ]), table="pages", batch_source="b2")
    assert r2b["skipped"]
    # the index holds 8 band rows per distinct kept doc
    sigs = cat.load(_sig_table("pages"))
    assert sigs.count() == 4 * 8
    assert sigs.select("doc_key").distinct().count() == 4


def test_near_ingest_heals_torn_commit(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    incremental_near_ingest(cat, _pages(spark, [
        ("https://a/1", "2024-01-01 00:00", BASE),
    ]), table="pages", batch_source="b1")
    # simulate a crash AFTER the data commit but BEFORE the sig commit:
    # append a doc to the data table directly (no sig rows for it)
    cat.write("pages", _pages(spark, [
        ("https://x/raw", "2024-01-01 12:00", _distinct(9)),
    ]), mode="append", lineage={"stage": "torn", "batch_source": "torn"})
    st = _sig_table("pages")
    assert cat.load(st).select("doc_key").distinct().count() == 1
    # next ingest must first heal the index (signature the diff files),
    # then near-dedup against the healed doc too
    r = incremental_near_ingest(cat, _pages(spark, [
        ("https://c/1", "2024-01-03 00:00", _distinct(9) + " tail"),
        ("https://c/2", "2024-01-03 00:01", _distinct(10)),
    ]), table="pages", batch_source="b3")
    assert r["rows_appended"] == 1
    urls = {r["url"] for r in cat.load("pages").select("url").collect()}
    assert urls == {"https://a/1", "https://x/raw", "https://c/2"}
    assert cat.load(st).select("doc_key").distinct().count() == 3


def test_threshold_domain(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), spark)
    # looser threshold keeps fewer docs; exact-only (1.0) keeps a
    # one-token variant
    incremental_near_ingest(cat, _pages(spark, [
        ("https://a/1", "2024-01-01 00:00", BASE),
    ]), table="p2", batch_source="b1", threshold=1.0)
    # the variant must differ enough that the 32-perm ESTIMATE is not
    # exactly 1.0 (a one-token append leaves shingle-Jaccard at 23/24,
    # which collides to est=1.0 with these fixed perms); ~8 new
    # shingles puts true J at ~0.74 where est=1.0 cannot happen
    far_variant = BASE + " eight more tokens waddle past the harbor now"
    r = incremental_near_ingest(cat, _pages(spark, [
        ("https://a/2", "2024-01-02 00:00", far_variant),
        ("https://a/3", "2024-01-02 00:01", BASE),
    ]), table="p2", batch_source="b2", threshold=1.0)
    assert r["rows_appended"] == 1  # variant kept, exact copy dropped
    urls = {x["url"] for x in cat.load("p2").select("url").collect()}
    assert urls == {"https://a/1", "https://a/2"}


def test_compaction_does_not_duplicate_sigs(spark, tmp_path):
    """Catalog.compact rewrites already-indexed rows into NEW files; the
    reconcile path-diff must not re-signature them (duplicate index
    rows would double probe fan-out and burn corpus-scale minhash CPU
    on every compaction)."""
    cat = Catalog(str(tmp_path / "wh"), spark)
    for b in range(3):
        incremental_near_ingest(cat, _pages(spark, [
            (f"https://c{b}/1", f"2024-01-0{b + 1} 00:00",
             _distinct(b)),
        ]), table="pc", batch_source=f"b{b}")
    st = _sig_table("pc")
    sig_rows_before = cat.load(st).count()
    assert sig_rows_before == 3 * 8  # 8 bands per doc
    cat.compact("pc", target_bytes=1 << 30, min_files=2)
    # next ingest triggers reconcile over the compacted files
    r = incremental_near_ingest(cat, _pages(spark, [
        ("https://d/1", "2024-01-05 00:00", _distinct(7)),
        ("https://d/2", "2024-01-05 00:01", _distinct(0)),  # dup
    ]), table="pc", batch_source="b9")
    assert r["rows_appended"] == 1
    assert cat.load(st).count() == sig_rows_before + 8
    assert cat.load(st).select("doc_key").distinct().count() == 4
