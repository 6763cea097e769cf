"""Benchmark harness (driver-run per round; also the local feedback loop).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE json
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "pages_per_sec": ...}.

The flagship measures the BASELINE.json north metric end to end:
deterministic pages -> extract_text -> geo anchors -> H3 cells res 0-9 ->
point-in-polygon clip -> IDW kNN interpolation onto res-5 cell centroids.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pages scale: 1M pages at sf0.1 — large enough that the flagship's
# fixed per-job floor (~2-4s of stage scheduling) is amortized and the
# measured pages/sec reflects pipeline throughput, small enough that
# generation (untimed) stays under ~30s
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", str(int(10_000_000 * _SF))))


def prepare_pages(spark, n_pages):
    """materialize the deterministic pages table once (data prep, not part
    of the measured pipeline - production reads pages from the lake)."""
    from osc_geo_h3grid_srv_spark.sources.pages import (
        PAGES_VERSION, pages_dataframe)
    path = f"/tmp/spark_graft_pages_v{PAGES_VERSION}_{n_pages}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        pages_dataframe(spark, n_pages, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(path)
    return path


def _flagship_pipeline(spark, pages_path):
    """returns (clipped_count, interpolated_count) after full compute.

    Single fused Python stage (extract + assign res0-9 + PIP flag); all
    downstream work (clip filter, parent rollup, IDW join) is JVM-side.
    """
    from pyspark.sql import functions as F

    from osc_geo_h3grid_srv_spark.functions import geo
    from osc_geo_h3grid_srv_spark.operators.index_pages import (
        extract_index_clip)
    from osc_geo_h3grid_srv_spark.operators.interpolate import idw_interpolate

    pages = spark.read.parquet(pages_path)
    # Germany-like region with a hole (broadcast polygons)
    shell = [(47.0, 5.5), (47.0, 15.5), (55.5, 15.5), (55.5, 5.5)]
    hole = [(49.0, 8.0), (49.0, 9.0), (50.0, 9.0), (50.0, 8.0)]
    pp = geo.PackedPolygons.from_latlng_rings([[shell, hole]], ["germany"])
    bc = spark.sparkContext.broadcast(pp.to_arrays())
    pts = extract_index_clip(pages, max_res=9, parent_res=1, packed_bc=bc,
                             bbox=pp.bounds(), clip_filter=False)
    clipped = pts.filter(F.col("in_region")).cache()
    n_clip = clipped.count()

    # IDW kNN (k=3, power=2) of a per-point value onto the REGION's
    # res-5 cell grid (the reference loader interpolates onto the
    # region's cells, not just populated ones). The grid comes from the
    # driver-side kernel polyfill (~1 ms for ~10^3 cells) — round 1
    # derived it with distinct+coalesce(1) over the data, which added a
    # serial micro-job to every run (the Amdahl floor in
    # BENCH-SCALING.json); Arrow createDataFrame + broadcast join keep
    # the big points side shuffle-free for the join.
    import pandas as pd

    from osc_geo_h3grid_srv_spark.functions import h3core
    grid = geo.polyfill(pp, 5)
    gla, glo = h3core.cell_to_latlng(grid)
    cells = spark.createDataFrame(pd.DataFrame({
        "h3_cell": h3core.cell_to_string(grid),
        "latitude": gla, "longitude": glo}))
    pts_v = clipped.select(
        "latitude", "longitude",
        (F.xxhash64("url") % 1000).cast("double").alias("value"))
    # region-bounded res-5 grid -> broadcast side of the join; the big
    # points side is never shuffled for the join
    interp = idw_interpolate(cells, pts_v, "value", k=3, power=2.0,
                             max_dist_km=60.0, broadcast_cells=True)
    n_interp = interp.count()
    clipped.unpersist()
    return n_clip, n_interp


def main():
    t_start = time.time()
    from osc_geo_h3grid_srv_spark.engine import make_spark
    spark = make_spark(cores=CPUS, shuffle_partitions=max(CPUS * 2, 32),
                       extra_conf={"spark.ui.enabled": "false",
                                   "spark.driver.memory": "48g"})
    import __spark_entry__ as em

    timings = {}
    extras = {}
    rep_secs = {}

    def run(name, fn, reps=2):
        # best-of-N with the DataFrame lineage rebuilt per rep (fn()
        # reconstructs the plan from the parquet scan each call, so no
        # materialized-shuffle reuse poisons later reps — BASELINE.md
        # protocol). Single-shot timings made r1->r2 comparisons pure
        # host noise (VERDICT r02 What's-wrong #3); raw arrays recorded.
        out = None
        rs = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            rs.append(round(time.time() - t0, 3))
        # adaptive third rep: when the two reps disagree >2x the epoch
        # moved mid-query (burstable host, BASELINE.md); one more rep
        # keeps the min() estimate from being a pair of stalls. The r4/r5
        # paired table's apparent 4-6x "regressions" (leakage_safe_split
        # 9.7s, distance_pairs_join 8.2s) re-measured at 2.0s/3.2s at the
        # same HEAD once warm — churn, not plans.
        while max(rs) > 2.0 * min(rs) and len(rs) < reps + 2:
            t0 = time.time()
            out = fn()
            rs.append(round(time.time() - t0, 3))
        timings[name] = min(rs)
        rep_secs[name] = rs
        return out

    # north-metric flagship (pages materialized untimed: production reads
    # the pages table from the lake; the metric is indexing throughput)
    t0 = time.time()
    pages_path = prepare_pages(spark, N_PAGES)
    extras["pages_prep_sec"] = round(time.time() - t0, 3)

    # warm the python workers (spawn + kernel imports) and the codegen/JIT
    # for the exact measured plan, untimed - a real cluster's executors
    # are long-lived and its generated code is compiled once
    t0 = time.time()
    _flagship_pipeline(spark, pages_path)
    extras["warmup_sec"] = round(time.time() - t0, 3)
    # best-of-3: the sandbox host's deliverable CPU varies across epochs
    # (see BASELINE.md); all rep times are recorded for auditability
    reps = []
    for _ in range(3):
        t0 = time.time()
        n_clip, n_interp = _flagship_pipeline(spark, pages_path)
        reps.append(round(time.time() - t0, 3))
    timings["flagship_index_pip_idw"] = min(reps)
    extras["flagship_rep_secs"] = reps
    extras["flagship_pages"] = N_PAGES
    extras["flagship_clipped_points"] = n_clip
    extras["flagship_interp_cells"] = n_interp
    extras["pages_per_sec"] = round(
        N_PAGES / timings["flagship_index_pip_idw"], 1)

    # the reference's largest shipped workload: 1,000,000 assets through
    # filter-assets (docs/README-geospatial.md:333-360, single-process
    # pandas + in-memory DuckDB there) — here: distributed cell
    # assignment at res 7 + broadcast equi-join + NULL-pass filter
    # flood-like h3 dataset prep, UNTIMED (the reference's filter-assets
    # reads an already-loaded dataset): res-7 cells covering the box
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from osc_geo_h3grid_srv_spark.functions import geo as geomod
    from osc_geo_h3grid_srv_spark.functions import h3core
    shell1m = [(47.0, 6.0), (47.0, 15.0), (55.0, 15.0), (55.0, 6.0)]
    pp1m = geomod.PackedPolygons.from_latlng_rings([[shell1m]], ["box"])
    cells1m = h3core.cell_to_string(geomod.polyfill(pp1m, 7))
    idx = np.arange(len(cells1m))
    ds_1m = spark.createDataFrame(pd.DataFrame({
        "h3_cell": cells1m,
        "flood_risk_mean": np.where(idx % 11 == 0, np.nan,
                                    (idx % 100) / 10.0)}))
    ds_1m = ds_1m.withColumn(
        "flood_risk_mean",
        F.when(F.isnan("flood_risk_mean"), None)
        .otherwise(F.col("flood_risk_mean"))).cache()
    ds_1m.count()

    def assets_1m():
        n = 1_000_000
        return spark.range(0, n, 1, CPUS * 2).select(
            F.col("id"),
            ((F.col("id") * 9301 + 49297) % 800000 / 100000.0 + 47.0)
            .alias("lat"),
            ((F.col("id") * 7927 + 1237) % 900000 / 100000.0 + 6.0)
            .alias("long"))

    def correlator_1m():
        from osc_geo_h3grid_srv_spark.functions.spark_udfs import (
            make_latlng_to_cell)
        to7 = make_latlng_to_cell(7)
        assets = assets_1m().withColumn(
            "cell_7",
            F.lower(F.hex(to7(F.col("lat"), F.col("long")))))
        j = assets.join(F.broadcast(ds_1m),
                        assets.cell_7 == ds_1m.h3_cell, "inner")
        j = j.filter((F.col("flood_risk_mean") > 5.0)
                     | F.col("flood_risk_mean").isNull())
        return j.count()

    correlator_1m()  # warm (worker pool for the res-7 UDF)
    c_reps = []
    for _ in range(2):
        t0 = time.time()
        matched = correlator_1m()
        c_reps.append(round(time.time() - t0, 3))
    timings["correlator_1m_assets"] = min(c_reps)
    extras["correlator_1m_rep_secs"] = c_reps
    extras["correlator_1m_matched"] = matched

    # all-16-resolution cell assignment on 1M assets (the correlator's
    # _add_cells surface, VERDICT r01 next-step #5): one mapInPandas pass
    # sharing the spherical projection across resolutions. Measured
    # same-session interleaved best-of-4 vs the round-1 16-independent-
    # UDF plan: 1.38s vs 1.88s (~1.4x) — rep spread on this host is 2-3x,
    # raw reps recorded.
    def correlate_allres_1m():
        from osc_geo_h3grid_srv_spark.operators.correlate import (
            add_cell_columns)
        a = add_cell_columns(assets_1m())
        return a.select(F.max(F.xxhash64(
            *[f"cell_{r}" for r in range(16)]))).collect()

    correlate_allres_1m()  # warm
    ar_reps = []
    for _ in range(2):
        t0 = time.time()
        correlate_allres_1m()
        ar_reps.append(round(time.time() - t0, 3))
    timings["correlate_allres_1m"] = min(ar_reps)
    extras["correlate_allres_1m_rep_secs"] = ar_reps
    extras["correlate_allres_16udf_baseline_sec"] = 1.884

    # operator queries (shared with the correctness gate). Since round
    # 5 the list is DERIVED from the registry instead of maintained by
    # hand (VERDICT r4 What's-wrong #4: 29 entries silently had no
    # timing): every queries() entry is benched unless it appears in
    # _BENCH_SKIP with a reason, and an entry that is neither benched
    # nor skipped fails the run loudly. The legacy ordering below is
    # kept for BENCH_r*.json row stability; registry entries not in it
    # (including future adds) are appended in registry order.
    heads = ["radius_reference", "grid_cell_agg", "correlator_null_filters",
             "idw_knn", "raster_tile_agg", "exact_dedup",
             "minhash_lsh_pairs", "simhash_pairs", "token_stats",
             "embedding_cosine_threshold", "tpch_q1_pricing",
             "broadcast_join_topn", "window_first_event",
             "h3_index_documents", "polyfill_region_cells", "ann_topk_lsh",
             "ann_topk_ivf", "bm25_topk", "training_mix_sample",
             "sessionize_events", "bigram_counts", "docfreq_idf",
             "csv_loader_index", "ivf_assign_counts",
             "pii_redaction_stats", "repetition_ratio",
             "image_decode_stats", "audio_decode_stats",
             "dedup_clusters", "boilerplate_removal",
             "span_dedup_coverage",
             "contamination_flags", "quality_model_scores",
             "pagerank_links", "chunk_documents", "pack_sequences",
             "url_canonical_domains", "domain_rollup",
             "bigram_lm_scores", "bpe_merges", "bpe_encode_counts",
             "span_dedup_removal", "html_link_graph", "robots_exclusion",
             "robots_wildcard_exclusion",
             "inverted_index", "dsir_selection", "phrase_search",
             "frontier_schedule", "shard_assignment", "corpus_drift",
             "pq_adc_topk", "inlink_profile", "winnow_fingerprints",
             "normalize_text", "hll_token_distinct",
             "cms_term_frequencies", "frontier_timeline",
             "jpeg_decode_stats", "gif_decode_stats",
             "video_frame_stats", "g711_decode_stats",
             "image_dhash_pairs", "image_dup_clusters", "audio_afp_pairs",
             "bloom_membership",
             "embedding_blocked_pairs", "hits_scores", "cdc_chunk_dedup",
             "anchor_text_profile", "sitemap_seed_rollup",
             "tpch_q3_shipping", "tpch_q5_local_supplier",
             "h3_compact_cells", "triangle_counts_links",
             "weighted_sample_by_lang", "allpairs_cosine_pairs",
             "containment_pairs", "rrf_hybrid_topk", "collocations_g2",
             "leakage_safe_split", "corpus_power_laws",
             "gi_star_hotspots", "h3_hotspot_cells", "morans_i",
             "zorder_layout_spans", "textrank_keywords",
             "funnel_conversion", "cohort_retention", "lisa_clusters",
             "hilbert_layout_spans", "distance_pairs_join",
             "asof_join_events", "interval_overlap_join", "kcore_links",
             "embedding_covariance", "dbscan_grid_clusters",
             "timeseries_gapfill", "edge_jaccard_links", "knn_graph",
             "burst_zscores",
             # round-4 continuation, third wave
             "trajectory_stats", "stay_points", "od_matrix_flows",
             "nearest_neighbor_join", "ripleys_k",
             "personalized_pagerank", "bfs_distances",
             "c4_line_filters", "tfidf_top_terms", "ewma_hourly",
             "cusum_hourly", "markov_transitions", "exact_quantiles",
             "fuzzy_title_pairs", "geodesic_area", "skew_profile",
             "distance_clusters", "session_paths", "link_reciprocity",
             "events_rollup", "pivot_type_by_dom", "iqr_outliers",
             # round-4 continuation, governance wave
             "label_propagation", "assoc_rules", "scd2_history",
             "constraint_audit", "snapshot_diff",
             "attribution_last_touch"]
    qs = em.queries()
    # every registry entry is benched unless skipped-with-reason here
    _BENCH_SKIP = {
        "pages_index_pipeline": "IS the flagship pipeline — already "
                                "measured as flagship_index_pip_idw",
    }
    heads += [n for n in qs if n not in heads and n not in _BENCH_SKIP]
    unbenched = [n for n in qs if n not in heads and n not in _BENCH_SKIP]
    stale = [n for n in heads if n not in qs]
    if unbenched or stale:
        raise SystemExit(f"bench.py heads out of sync with registry: "
                         f"unbenched={unbenched} stale={stale}")

    def _force(df):
        # noop sink (round 4): count() is NOT a valid forcing function
        # — Catalyst rewrites it to an empty-schema scan, pruning the
        # entire projection of map-only queries (span dedup, normalize,
        # quality scores measured near-constant at any scale). The noop
        # sink computes every column of every row and discards. Suite
        # timings from r4 on are therefore honest but NOT comparable to
        # the count()-forced r1-r3 rows; extras["sink"] records this.
        df.write.format("noop").mode("overwrite").save()

    # local feedback loop: SPARK_GRAFT_ONLY=name1,name2 times just those
    # suite entries (never set by the driver — default output unchanged)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        heads = [n for n in heads if n in set(only.split(","))]
    for name in heads:
        run(name, lambda f=qs[name]: _force(f(spark, SF_DIR)))

    extras["sink"] = "noop"
    # same-epoch host-capacity stamp: the sandbox box's deliverable CPU
    # swings up to 7x between epochs (BASELINE.md); a fixed-work pure-
    # ALU probe at 8/32 workers records what the host could actually
    # deliver WHILE this suite ran, so cross-round BENCH_r*.json
    # comparisons can be epoch-adjusted instead of guessed at.
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from host_probe import _cpu_work, _pool_time
        alu8, alu32 = _pool_time(_cpu_work, 8), _pool_time(_cpu_work, 32)
        extras["host_probe"] = {
            "alu_sec_8w": round(alu8, 2), "alu_sec_32w": round(alu32, 2),
            "alu_eff_8_to_32": round(alu8 / alu32, 3)}
    except Exception as exc:  # probe is diagnostic, never fatal
        extras["host_probe"] = {"error": str(exc)}
    extras["rep_secs"] = rep_secs
    total = round(sum(timings.values()), 3)
    # HEADLINE SCALARS FIRST, bulky per-query dicts LAST: the driver
    # captures the tail of stdout, and BENCH_r03.json lost value/
    # pages_per_sec/flagship to front-truncation of this one line
    # (VERDICT r3 What's-wrong #2). Also persist the full record to
    # BENCH.json at the repo root so no capture window can eat it.
    headline_keys = [
        "pages_per_sec", "flagship_pages", "flagship_rep_secs",
        "flagship_clipped_points", "flagship_interp_cells",
        "correlator_1m_rep_secs", "correlator_1m_matched",
        "pages_prep_sec", "warmup_sec",
    ]
    record = {
        "metric": "H3-indexed pages/sec (cell assign + PIP + kNN "
                  "interpolate) + operator suite",
        "value": total,
        "unit": "sec",
        "sf": _SF,
        "cpus": CPUS,
        "flagship_sec": timings.get("flagship_index_pip_idw"),
        **{k: extras[k] for k in headline_keys if k in extras},
        "wall_total": round(time.time() - t_start, 3),
        "queries": timings,
        **{k: v for k, v in extras.items() if k not in headline_keys},
    }
    out = json.dumps(record)
    if not only:
        # subset runs (SPARK_GRAFT_ONLY) are local feedback probes —
        # never let them clobber the full-suite BENCH.json artifact
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH.json"), "w") as fh:
            fh.write(out + "\n")
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
