"""Distributed connected components over a pair/edge DataFrame, and the
dedup-cluster reduction built on it.

This is the missing last step of every near-dup pipeline in this repo
(minhash_lsh_pairs / simhash_pairs / word_jaccard_pairs emit PAIRS): at
100 TB you do not act on pairs, you act on CLUSTERS — group transitively
connected duplicates and keep one representative per cluster.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature). Each round is a pure DataFrame pass:

  large-star(u): for every neighbor v > u, connect v to
                 m = min(N(u) + {u})
  small-star(u): orient each edge toward its larger endpoint, then for
                 every neighbor v < u connect v (and u) to m = min(N(u))

Both are one window-min over a node-keyed partition plus a projection —
no collect, no driver-side graph. The pair converges to rooted stars
(edge (v, root) for every node) in O(log^2 n) rounds, O(log n) in
practice; each round shuffles the edge list once, keyed by node id, so
the cost is rounds x one co-partitioned exchange of (long, long) rows.

Scale notes (100 TB / 10^11-edge regime):
* The per-round state is only the current edge set — never adjacency
  lists materialized per node; a mega-component (the web's giant
  near-dup cluster) appears as a skewed window partition, which AQE
  skew-split handles because each round's window is a plain
  hash-partitioned aggregate, and large-star specifically exists to
  break high-degree nodes across rounds.
* Lineage is truncated every round with localCheckpoint(eager=True) —
  an iterative driver loop without it re-executes the whole chain each
  round (round-1 lesson; same pattern as Lloyd iterations in
  similarity.py).
* Convergence is detected by edge-set stability (count of changed
  rows == 0), one cheap aggregate per round on the already-checkpointed
  result.

The iterative loop is NOT expressible as one SQL statement in Spark,
but connected components itself IS oracle-able: DuckDB's recursive CTE
computes reachability labels and min-reduces them (see
_cc_oracle_sql in __spark_entry__.py), giving the entry a full
value-hash gate despite the iterative implementation.

Reference parity: the reference repo has no clustering step (its dedup
is cell-key exact grouping, geomesh.py loader path); this operator is
part of the LLM-training-data extension the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round. edges: (u, v) canonical
    undirected pairs (u != v). Returns the new canonical edge set."""
    if large:
        # symmetrize: every node sees its full neighborhood
        adj = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        w = Window.partitionBy("u")
        # m = min over N(u) + {u}; u is constant per partition
        adj = adj.withColumn(
            "m", F.least(F.min("v").over(w), F.col("u")))
        out = (adj.filter(F.col("v") > F.col("u"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    else:
        # orient toward the larger endpoint: key = max, payload = min
        adj = edges.select(F.greatest("u", "v").alias("u"),
                           F.least("u", "v").alias("v"))
        w = Window.partitionBy("u")
        adj = adj.withColumn("m", F.min("v").over(w))
        out = (adj.select(F.col("v").alias("u"), F.col("m").alias("v"))
               .union(adj.select("u", F.col("m").alias("v"))))
    # canonicalize (big, small), drop self-loops, dedup
    return (out.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .distinct())


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25
                         ) -> DataFrame:
    """pairs: any DataFrame with two node-id columns (long-castable).
    Returns (node, component) where component is the smallest node id
    in the node's connected component; singleton nodes (those never
    appearing in pairs) are the caller's concern — join the result back
    with a coalesce(component, node).
    """
    edges = (pairs.select(F.col(src).cast("long").alias("u"),
                          F.col(dst).cast("long").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
             .distinct()
             .localCheckpoint(eager=True))

    def _sig(df):
        # one-job convergence probe: (count, order-insensitive content
        # hash — bit_xor, which cannot overflow under ANSI arithmetic
        # the way a long sum can). Equal signatures on distinct sets
        # mean set equality except with ~2^-64-per-round hash-collision
        # odds — which the exact exceptAll confirm below closes, so the
        # fast path costs ONE job per round instead of count +
        # exceptAll (two).
        r = df.agg(F.count("*").alias("n"),
                   F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
        return (r["n"], r["h"])

    sig_old = _sig(edges)
    for _ in range(max_iter):
        after_large = _star_round(edges, large=True)
        after_small = _star_round(after_large, large=False)
        after_small = after_small.localCheckpoint(eager=True)
        sig_new = _sig(after_small)
        if sig_new == sig_old:
            # exact confirm at the (probable) fixed point: star edges
            # are fixed points of both rounds, so same-count distinct
            # sets are equal iff the one-way exceptAll is empty
            if after_small.exceptAll(edges).limit(1).count() == 0:
                edges = after_small
                break
        edges, sig_old = after_small, sig_new
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating rounds")
    # fixed point is a star rooted at the component min: (node, root)
    # for every non-root node, plus the roots themselves
    nodes = edges.select(F.col("u").alias("node"),
                         F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"),
                         F.col("v").alias("component")).distinct()
    return nodes.union(roots).distinct()


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Near-dup cluster assignment: every document mapped to its
    cluster representative (min doc id of its transitive duplicate
    cluster; docs in no pair represent themselves) plus the cluster
    size. Downstream dedup = filter(doc_id == cluster_rep)."""
    cc = connected_components(pairs, src=src, dst=dst)
    out = (docs.select(F.col(id_col).cast("long").alias(id_col))
           .join(cc, on=F.col(id_col) == F.col("node"), how="left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col))
                   .alias("cluster_rep")))
    w = Window.partitionBy("cluster_rep")
    return out.withColumn("cluster_size",
                          F.count("*").over(w).cast("long"))


def dedup_keep_decision(clustered: DataFrame, quality_col: str,
                        id_col: str = "doc_id") -> DataFrame:
    """The final dedup DECISION: per cluster keep exactly one document —
    the highest `quality_col` (ties broken by lowest id, so the choice
    is deterministic). Adds a `keep` boolean; `filter(keep)` is the
    deduplicated corpus.

    This replaces the naive keep-the-representative policy (the rep is
    just the min id) with the keep-the-best policy production pipelines
    use (e.g. keep the highest quality-classifier score among
    near-duplicates). The ranking window partitions by cluster_rep —
    the SAME key as dedup_clusters' size window — so Catalyst computes
    both windows over one hash-partitioned exchange."""
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc())
    return clustered.withColumn("keep", F.row_number().over(w) == 1)


def leakage_safe_split(clusters: DataFrame,
                       fractions: list[tuple[str, float]] | None = None,
                       salt: str = "split1",
                       rep_col: str = "cluster_rep") -> DataFrame:
    """Near-dup-aware train/val/test assignment: the split is a pure
    function of the CLUSTER REPRESENTATIVE, so every member of a
    near-duplicate cluster lands in the same split — the property that
    stops test-set leakage through paraphrased/mirrored pages (the
    failure mode of hashing raw doc ids, where two near-identical docs
    straddle train and test).

    Assignment replays everywhere: u = first 8 hex chars of
    md5(salt | rep) compared against cumulative-fraction thresholds
    rendered as 8-digit hex literals — the same replayable-keep trick
    the training-mix sampler uses, so DuckDB/any engine reproduces the
    split bit-for-bit. Adding documents never reshuffles existing
    clusters' splits (stable salt), and fractions hold in expectation
    over clusters.

    Input: (doc_id, rep_col, ...) from dedup_clusters. Output adds a
    `split` column. One codegen projection — zero additional shuffles
    on top of the clustering.
    """
    if fractions is None:
        fractions = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if not fractions:
        raise ValueError("fractions must be non-empty")
    tot = sum(f for _, f in fractions)
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {tot}, expected 1.0")
    names = [n for n, _ in fractions]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    u = F.substring(
        F.md5(F.concat(F.lit(salt + "|"),
                       F.col(rep_col).cast("string"))), 1, 8)
    cum = 0.0
    expr = None
    for name, frac in fractions[:-1]:
        cum += frac
        thr = format(min(int(cum * 2 ** 32), 2 ** 32 - 1), "08x")
        cond = u < F.lit(thr)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return clusters.withColumn("split", expr)
