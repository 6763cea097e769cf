"""Structured Streaming ingest seam (streaming/ingest.py): landing-dir
pages stream -> same extract/assign stages -> foreachBatch APPEND
snapshots; the stream checkpoint makes re-runs exactly-once (a file
already processed is never re-committed)."""

import os

import pytest


@pytest.fixture()
def catalog(spark, tmp_path):
    from osc_geo_h3grid_srv_spark.sources.catalog import Catalog
    return Catalog(str(tmp_path / "wh"), spark)


def _land(spark, landing, lo, hi, name):
    from osc_geo_h3grid_srv_spark.sources.pages import pages_dataframe
    df = pages_dataframe(spark, hi - lo, partitions=2, start=lo)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name))
    # flatten into the landing root (readStream wants files, not dirs)
    import glob
    import shutil
    for i, f in enumerate(
            glob.glob(os.path.join(landing, name, "*.parquet"))):
        shutil.move(f, os.path.join(landing, f"{name}-{i}.parquet"))
    shutil.rmtree(os.path.join(landing, name))


def test_stream_ingest_exactly_once(spark, tmp_path, catalog):
    from osc_geo_h3grid_srv_spark.operators.index_pages import (
        assign_cells, extract_points)
    from osc_geo_h3grid_srv_spark.sources.pages import pages_dataframe
    from osc_geo_h3grid_srv_spark.streaming.ingest import stream_index_pages

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    _land(spark, landing, 0, 400, "batch1")
    q = stream_index_pages(spark, catalog, landing, ckpt,
                           dataset="pts_stream", max_res=7)
    q.awaitTermination(300)

    expected1 = assign_cells(
        extract_points(pages_dataframe(spark, 400, partitions=2)),
        max_res=7).count()
    man1 = catalog.read_manifest("pts_stream")
    assert man1["total_rows"] == expected1
    assert man1["lineage"]["stage"] == "stream_index_pages"

    # second wave of files; same checkpoint -> only the new files commit
    _land(spark, landing, 400, 1000, "batch2")
    q = stream_index_pages(spark, catalog, landing, ckpt,
                           dataset="pts_stream", max_res=7)
    q.awaitTermination(300)

    expected_all = assign_cells(
        extract_points(pages_dataframe(spark, 1000, partitions=2)),
        max_res=7).count()
    man2 = catalog.read_manifest("pts_stream")
    assert man2["total_rows"] == expected_all
    # append lineage chain: snapshot advanced, parent preserved
    assert man2["snapshot_id"] > man1["snapshot_id"]

    # re-run with NO new files: checkpoint prevents any further commit
    q = stream_index_pages(spark, catalog, landing, ckpt,
                           dataset="pts_stream", max_res=7)
    q.awaitTermination(300)
    assert catalog.read_manifest("pts_stream")["snapshot_id"] \
        == man2["snapshot_id"]
