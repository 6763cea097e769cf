"""Operator-suite scaling evidence (VERDICT r3 Next #5): the flagship
has N->4N numbers (tools/bench_scaling.py); this tool extends the same
protocol to the 10 heaviest suite operators, on two axes:

* PARALLELISM: local[8] vs local[32] on identical input, each level a
  fresh subprocess JVM, palindrome visit order (8, 32, 32, 8) so
  monotone host drift cancels; per-query best-of across visits.
* DATA SCALE: two deterministic amplifications of the sf0.1 documents
  corpus (doc_id-shifted copies, materialized once to parquet) that
  are BOTH large enough for parallel work to dominate the fixed
  per-stage driver floor (the first cut of this tool compared raw
  sf0.1 vs 4x and every query was floor-bound: t8 ~ t32 ~ 1-3 s,
  efficiency read as ~0.25 at ANY plan shape). growth =
  t(big)/t(small) at fixed cores, expected ~ big/small for linear
  operators; a superlinear (quadratic-join / driver-collect) term
  shows up as growth >> big/small.

Interpretation guardrail: this box's 8->32 ceiling is ~0.5-0.53 for
ANY workload shape (pure-ALU / NumPy / pure-JVM probes,
tools/host_probe.py, BENCH-SCALING-ATTRIB.json) — an operator is only
scale-suspect if its 8->32 efficiency falls clearly BELOW the
same-epoch host ceiling, or its 4x growth factor is well above 4.

Usage:
    python tools/bench_scaling_suite.py            # full report
    (child mode: --cores N --sf-dir D, internal)

Env: SPARK_GRAFT_SUITE_REPS (default 2), SPARK_GRAFT_SUITE_AMP_SMALL /
_BIG (default 8 / 32), SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Writes BENCH-SCALING-SUITE.json at the repo root and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_SUITE_REPS", "2"))
AMP_SMALL = int(os.environ.get("SPARK_GRAFT_SUITE_AMP_SMALL", "8"))
AMP_BIG = int(os.environ.get("SPARK_GRAFT_SUITE_AMP_BIG", "32"))

QUERIES = [
    "pagerank_links", "dedup_clusters_full", "bpe_merges",
    "dsir_selection", "minhash_lsh_pairs", "simhash_pairs",
    "contamination_flags", "domain_rollup", "bigram_lm_scores",
    "span_dedup_removal",
    # round-4 additions (all scale with the documents table: edges /
    # chunks / anchors grow linearly with the amplified corpus)
    "hits_scores", "triangle_counts_links", "cdc_chunk_dedup",
    "anchor_text_profile",
    # late round-4: the exact-similarity prefix join (its candidate
    # volume is the scale question) and the two iteration-bound text
    # graph/stat operators
    "allpairs_cosine_pairs", "textrank_keywords", "collocations_g2",
    # round-4 third wave (documents-scaled): two more iteration-bound
    # graph ops, the token-stream TF-IDF rollup, the zero-exchange C4
    # map (growth should be ~linear, 8->32 near the host ceiling), and
    # the blocked fuzzy join (in-block candidate volume is the scale
    # question)
    "personalized_pagerank", "bfs_distances", "tfidf_top_terms",
    "c4_line_filters", "fuzzy_title_pairs",
]


def _build_dedup_clusters_full(spark, sf_dir):
    """the entry q_dedup_clusters caps at doc_id < 150 (its oracle is a
    recursive-CTE closure over a brute-force pair join, quadratic in
    DuckDB) — useless for scaling measurement. This builder runs the
    SAME operator over the whole corpus with MinHash-LSH pairs as the
    edge set, which is the production composition."""
    import os
    from osc_geo_h3grid_srv_spark.operators.cluster import dedup_clusters
    from osc_geo_h3grid_srv_spark.operators.dedup import minhash_lsh_pairs
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_perm=32,
                              bands=8, threshold=0.5, ngram=2)
    return dedup_clusters(docs, pairs.select("id_a", "id_b")).select(
        "doc_id", "cluster_rep", "cluster_size")


BUILDERS = {"dedup_clusters_full": _build_dedup_clusters_full}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def amplify(sf_dir: str, out_dir: str, factor: int) -> None:
    """materialize a factor-x corpus: documents unioned `factor` times,
    copy k's doc_ids shifted by k*n_docs (ids stay DENSE — pagerank
    derives its node count from max(doc_id)+1) and copy k>0's tokens
    prefixed with a copy tag so the copies are textually DISJOINT: each
    copy carries the original's internal near-dup structure but no
    cross-copy duplicates, so dedup-family pair counts grow ~linearly
    with factor like a real crawl, instead of quadratically by
    construction. Every other table is copied verbatim. Deterministic —
    no RNG."""
    from osc_geo_h3grid_srv_spark.engine import make_spark
    from pyspark.sql import functions as F
    spark = make_spark(cores=8, shuffle_partitions=16,
                       extra_conf={"spark.ui.enabled": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    parts = []
    for k in range(factor):
        p = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * n_docs)).cast("long"))
        if k:
            tag = F.lit(f"c{k}")
            p = p.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split(F.col("text"), " "),
                                lambda t: F.concat(tag, t)), " "))
        parts.append(p)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    spark.stop()
    for t in TABLES:
        if t == "documents":
            continue
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)


def run_level(cores: int, sf_dir: str, reps: int) -> dict:
    import __spark_entry__ as em
    from osc_geo_h3grid_srv_spark.engine import make_spark
    spark = make_spark(cores=cores,
                       shuffle_partitions=max(cores * 2, 16),
                       extra_conf={"spark.ui.enabled": "false",
                                   "spark.driver.memory": "24g"})
    qs = em.queries()
    out = {}

    def force(df):
        # noop sink: computes EVERY column of EVERY row and discards.
        # count() is NOT a valid forcing function here — Catalyst
        # rewrites it to an empty-schema scan, pruning the entire
        # projection, so map-only operators (span dedup, normalize)
        # measured flat at any data scale (the first two cuts of this
        # tool showed 0.3 s at 32x — the work simply never ran).
        df.write.format("noop").mode("overwrite").save()

    for name in QUERIES:
        fn = BUILDERS.get(name) or qs[name]
        n = fn(spark, sf_dir).count()  # rows (pruned; untimed)
        force(fn(spark, sf_dir))       # untimed warmup: workers + JIT
        rs = []
        for _ in range(reps):
            t0 = time.time()
            force(fn(spark, sf_dir))
            rs.append(round(time.time() - t0, 3))
        out[name] = {"sec": min(rs), "rep_secs": rs, "rows": n}
    spark.stop()
    return out


def _merge_best(a: dict, b: dict) -> dict:
    out = {}
    for k in a:
        reps = a[k]["rep_secs"] + b[k]["rep_secs"]
        best = a[k] if a[k]["sec"] <= b[k]["sec"] else b[k]
        out[k] = {"sec": best["sec"], "rep_secs": reps,
                  "rows": best["rows"]}
    return out


def _child(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cores",
         str(cores), "--sf-dir", sf_dir],
        capture_output=True, text=True, cwd=REPO, env=os.environ)
    lines = [ln for ln in out.stdout.splitlines()
             if ln.startswith("RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout + out.stderr)
        raise SystemExit(f"level local[{cores}] @ {sf_dir} failed")
    return json.loads(lines[-1][len("RESULT "):])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--sf-dir", type=str, default=SF_DIR)
    args = ap.parse_args()
    if args.cores:
        print("RESULT " + json.dumps(
            run_level(args.cores, args.sf_dir, REPS)))
        return

    small_dir = tempfile.mkdtemp(prefix="sfamp_s_")
    big_dir = tempfile.mkdtemp(prefix="sfamp_b_")
    amp_dirs = {AMP_SMALL: small_dir, AMP_BIG: big_dir}
    try:
        for f, d in amp_dirs.items():
            amplify(SF_DIR, d, f)
        ratio = AMP_BIG / AMP_SMALL
        report = {"metric": f"suite 8->32 parallel efficiency at "
                            f"{AMP_SMALL}x/{AMP_BIG}x sf0.1 + data "
                            f"growth (expected ~{ratio:g} for linear)",
                  "sf_dir": SF_DIR,
                  "amp_factors": [AMP_SMALL, AMP_BIG],
                  "reps_best_of_per_visit": REPS, "queries": {}}
        levels = {}
        for f, d in amp_dirs.items():
            a8 = _child(8, d)
            a32 = _child(32, d)
            b32 = _child(32, d)
            b8 = _child(8, d)
            levels[(f, 8)] = _merge_best(a8, b8)
            levels[(f, 32)] = _merge_best(a32, b32)
        for q in QUERIES:
            rec = {}
            for f in (AMP_SMALL, AMP_BIG):
                rec[f"local8_{f}x"] = levels[(f, 8)][q]
                rec[f"local32_{f}x"] = levels[(f, 32)][q]
                rec[f"eff_8_32_at_{f}x"] = round(
                    levels[(f, 8)][q]["sec"]
                    / max(levels[(f, 32)][q]["sec"], 1e-9) / 4.0, 3)
            for c in (8, 32):
                rec[f"growth_at_local{c}"] = round(
                    levels[(AMP_BIG, c)][q]["sec"]
                    / max(levels[(AMP_SMALL, c)][q]["sec"], 1e-9), 3)
            report["queries"][q] = rec
        out = json.dumps(report)
        with open(os.path.join(REPO, "BENCH-SCALING-SUITE.json"),
                  "w") as fh:
            fh.write(out + "\n")
        print(out)
    finally:
        for d in amp_dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
