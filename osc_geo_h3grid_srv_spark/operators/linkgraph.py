"""Link-graph analytics: distributed PageRank over an edge DataFrame.

Web-corpus pipelines rank hosts/pages by link authority (PageRank and
its variants are the public standard) to drive crawl prioritization
and quality weighting. The engine's job is the iterative scoring pass
over an edge table far too large to collect.

Plan shape per iteration (the thing that must hold at 10^11 edges):

* `edges ⋈ ranks` on src — both sides hash-partitioned by the same
  key; the edge list (with out-degree attached ONCE, up front) is
  localCheckpoint'ed so every iteration reuses the materialized,
  already-partitioned edge blocks instead of recomputing lineage.
* contributions groupBy(dst) — one partial-aggregated exchange.
* dangling mass (nodes with no out-links) is a one-row aggregate
  crossJoin-broadcast back in — no collect, no driver round-trip.
* ranks are rounded to `round_digits` each iteration: this pins the
  floating-point state so an independent engine (the DuckDB oracle
  replays the same K iterations as chained CTEs) reaches bit-identical
  ranks — distributed summation order cannot drift the low bits into
  the compared digits.
* lineage truncated per iteration with localCheckpoint(eager=True)
  (same round-1 lesson as cluster.py / Lloyd in similarity.py).

Total cost: K iterations x (one co-keyed join + one groupBy exchange).
No step is ever keyed by anything wider than a node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             num_iter: int = 5, round_digits: int = 9,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution.

    edges: DataFrame with long-castable (src, dst) columns; multi-edges
    are deduplicated. Nodes = every id appearing as src or dst.
    Returns (node, rank) with rank rounded to `round_digits`; ranks sum
    to ~1 (exactly 1 up to rounding).
    """
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # attach out-degree once; iterations reuse this materialized edge set
    ew = (e.join(outdeg, "src")
          .select("src", "dst", "deg")
          .localCheckpoint(eager=True))
    # dangling node set (no out-edges) computed ONCE and materialized —
    # deriving it inside the loop would re-run the edge-build lineage
    # every iteration
    dangling_nodes = (nodes.join(outdeg,
                                 nodes.node == outdeg.src, "left_anti")
                      .localCheckpoint(eager=True))
    n_row = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = (nodes.crossJoin(F.broadcast(n_row))
             .select("node", F.round(F.lit(1.0) / F.col("n"),
                                     round_digits).alias("rank"))
             .localCheckpoint(eager=True))
    d = float(damping)
    for _ in range(num_iter):
        contrib = (ew.join(ranks, ew.src == ranks.node)
                   .select("dst", (F.col("rank") / F.col("deg"))
                           .alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("contrib")))
        # dangling mass leaks each step; redistribute uniformly. One-row
        # aggregate, broadcast — never collected.
        dangling = (ranks.join(dangling_nodes, "node", "left_semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dmass")))
        ranks = (nodes
                 .join(contrib, nodes.node == contrib.dst, "left")
                 .crossJoin(F.broadcast(dangling))
                 .crossJoin(F.broadcast(n_row))
                 .select("node",
                         F.round((1.0 - d) / F.col("n")
                                 + d * (F.coalesce(F.col("contrib"),
                                                   F.lit(0.0))
                                        + F.col("dmass") / F.col("n")),
                                 round_digits).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def personalized_pagerank(edges: DataFrame, seeds: list[int],
                          damping: float = 0.85, num_iter: int = 5,
                          round_digits: int = 9, src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """Personalized PageRank (topic-sensitive PageRank, Haveliwala
    2002 — public algorithm): random walk with restart where BOTH the
    teleport step and the dangling-mass redistribution land uniformly
    on the seed set instead of all nodes. The crawl-frontier /
    related-page primitive: scores measure proximity to the seeds, and
    non-seeds unreachable from them stay at exactly 0.

    Same plan discipline as pagerank(): the degree-annotated edge list
    is materialized once, each iteration is one co-keyed join + one
    partial-aggregated groupBy + a broadcast 1-row dangling aggregate,
    ranks rounded per iteration so the DuckDB chained-CTE replay is
    bit-identical. The seed set is a parameter (a local list, like k or
    damping), so the teleport flag is a broadcast semi-join — never a
    corpus-sized side input."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if len(set(seeds)) != len(seeds):
        raise ValueError(f"duplicate seeds: {seeds}")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    spark = edges.sparkSession
    seed_df = spark.createDataFrame([(int(s),) for s in seeds],
                                    "node long")
    # teleport weight per node, attached once: 1/|S| on seeds, else 0
    ns = float(len(seeds))
    nodes = (nodes.join(F.broadcast(seed_df.withColumn(
        "tele", F.lit(1.0 / ns))), "node", "left")
        .select("node", F.coalesce("tele", F.lit(0.0)).alias("tele"))
        .localCheckpoint(eager=True))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ew = (e.join(outdeg, "src").select("src", "dst", "deg")
          .localCheckpoint(eager=True))
    dangling_nodes = (nodes.select("node")
                      .join(outdeg, nodes.node == outdeg.src,
                            "left_anti")
                      .localCheckpoint(eager=True))
    d = float(damping)
    ranks = nodes.select(
        "node", F.round(F.col("tele"), round_digits).alias("rank")) \
        .localCheckpoint(eager=True)
    for _ in range(num_iter):
        contrib = (ew.join(ranks, ew.src == ranks.node)
                   .select("dst", (F.col("rank") / F.col("deg"))
                           .alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("contrib")))
        dangling = (ranks.join(dangling_nodes, "node", "left_semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("dmass")))
        ranks = (nodes
                 .join(contrib, nodes.node == contrib.dst, "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         F.round((1.0 - d) * F.col("tele")
                                 + d * (F.coalesce(F.col("contrib"),
                                                   F.lit(0.0))
                                        + F.col("dmass")
                                        * F.col("tele")),
                                 round_digits).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def bfs_distances(edges: DataFrame, sources: list[int],
                  max_hops: int, directed: bool = True,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """Multi-source BFS hop distances: (node, dist) for every node
    reachable from the source set within max_hops directed (or
    undirected) hops; dist is the MINIMUM hop count (0 for sources).
    The link-graph reachability primitive (crawl-depth analysis,
    seed-distance features).

    Plan shape per hop — the thing that must hold at 10^11 edges: one
    frontier-keyed equi-join (frontier ⋈ edges on src) + one anti-join
    against the visited set + a distinct on the NEW frontier only;
    frontier and visited are localCheckpoint'ed per round so lineage
    stays flat. Integer-exact, so the DuckDB chained-CTE replay
    matches bit-for-bit."""
    if not sources:
        raise ValueError("sources must be non-empty")
    if max_hops < 0:
        raise ValueError(f"max_hops {max_hops} must be >= 0")
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.filter(F.col("src") != F.col("dst")).distinct() \
        .localCheckpoint(eager=True)
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(int(s),) for s in set(sources)], "node long") \
        .localCheckpoint(eager=True)
    visited = frontier.select("node", F.lit(0).cast("int")
                              .alias("dist"))
    for hop in range(1, max_hops + 1):
        nxt = (e.join(frontier, e.src == frontier.node)
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited, "node", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        visited = visited.union(
            nxt.select("node", F.lit(hop).cast("int").alias("dist"))) \
            .localCheckpoint(eager=True)
        frontier = nxt
    return visited


def hits(edges: DataFrame, num_iter: int = 5, round_digits: int = 9,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public algorithm) —
    the complement to PageRank for crawl seeding: a high-hub page is a
    good place to FIND links (directory/index pages), a high-authority
    page is a good page to BE linked (the content). Returns
    (node, hub, auth).

    Same plan discipline as pagerank(): the deduplicated edge list is
    materialized once (localCheckpoint) and every iteration is two
    co-keyed joins + two partial-aggregated groupBy exchanges; the L2
    norms are one-row aggregates broadcast back in — no collect. Scores
    are rounded to `round_digits` per iteration so the DuckDB oracle's
    chained-CTE replay reaches identical values (IEEE sqrt/divide are
    correctly rounded in both engines; rounding absorbs distributed
    summation order)."""
    if num_iter <= 0:
        raise ValueError(f"num_iter must be positive, got {num_iter}")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        z = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))
                       .alias("z"))
        return (scores.crossJoin(F.broadcast(z))
                .select("node",
                        F.round(F.col(col)
                                / F.when(F.col("z") == 0, F.lit(1.0))
                                .otherwise(F.col("z")),
                                round_digits).alias(col))
                .localCheckpoint(eager=True))

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(num_iter):
        a = (e.join(hubs, e.src == hubs.node)
             .groupBy("dst").agg(F.sum("hub").alias("auth")))
        auth = _norm(nodes.join(a, nodes.node == a.dst, "left")
                     .select("node", F.coalesce("auth", F.lit(0.0))
                             .alias("auth")), "auth")
        h = (e.join(auth, e.dst == auth.node)
             .groupBy("src").agg(F.sum("auth").alias("hub")))
        hubs = _norm(nodes.join(h, nodes.node == h.src, "left")
                     .select("node", F.coalesce("hub", F.lit(0.0))
                             .alias("hub")), "hub")
    return hubs.join(auth, "node").select("node", "hub", "auth")


def label_propagation(edges: DataFrame, num_iter: int = 4,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """community detection by synchronous label propagation (Raghavan
    et al. 2007, public algorithm) over the UNDIRECTED graph — the
    cheap community signal web pipelines use to spot link farms /
    mirror families (a community that is too dense or too uniform is a
    spam cluster candidate). Returns (node, label): nodes sharing a
    label after `num_iter` rounds are one community.

    Determinism: updates are SYNCHRONOUS (every node recomputes from
    the previous round's labels — no sequential scan order to pin) and
    the per-node winner is max_by((count, -label)), i.e. the most
    frequent neighbor label with ties to the SMALLEST label. Both
    choices make the whole run a pure function of the edge set, so a
    DuckDB replay of the same rounds as chained materialized CTEs
    reaches the identical labeling — integer counts only, no FP state
    at all.

    Plan shape per round (holds at 10^11 edges): one co-keyed join
    (symmetrized edges x labels on the neighbor id) + one
    partial-aggregated groupBy((node, label)) + the per-node max_by
    groupBy — nothing on the wire wider than (id, id, count). The
    symmetrized edge list is materialized once (localCheckpoint);
    labels re-checkpoint each round to truncate lineage. Nodes are the
    edge endpoints (self-loops dropped), each starting as its own
    label."""
    if num_iter <= 0:
        raise ValueError(f"num_iter must be positive, got {num_iter}")
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")))
    sym = (e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionAll(e.select(F.col("v").alias("node"),
                              F.col("u").alias("nbr")))
           .distinct().localCheckpoint(eager=True))
    nodes = sym.select("node").distinct().localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("label"))
    for it in range(num_iter):
        prev = labels.select(F.col("node").alias("__n"),
                             F.col("label").alias("__l"))
        votes = (sym.join(prev, sym.nbr == prev.__n)
                 .groupBy("node", "__l")
                 .agg(F.count("*").alias("__c")))
        win = (votes.groupBy("node")
               .agg(F.max_by("__l", F.struct(F.col("__c"),
                                             -F.col("__l")))
                    .alias("label")))
        labels = (nodes.join(win, "node", "left")
                  .select("node",
                          F.coalesce(win.label, F.col("node"))
                          .alias("label")))
        # truncate lineage between rounds, but return the FINAL round
        # un-checkpointed so callers (and the plan audit) see the real
        # per-round plan shape instead of an opaque checkpoint scan
        if it != num_iter - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels


def kcore(edges: DataFrame, k: int, num_rounds: int = 12,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core of the UNDIRECTED graph by synchronous peeling — the
    standard density backbone (a node is in the k-core iff it keeps
    >= k neighbors after everyone below k is recursively removed).
    Web pipelines use it to split organic link neighborhoods (shallow
    cores) from densely self-linking farm/mirror families (deep
    cores), the same role as triangle_counts but transitive. Returns
    (node, deg): the surviving nodes with their degree INSIDE the
    surviving subgraph.

    Peeling rule per round (synchronous, so the run is a pure function
    of the edge set — no scan order to pin): alive_{i+1} = nodes of
    alive_i whose degree within alive_i is >= k. Exactly `num_rounds`
    rounds run; peeling is monotone, so once the set is stable every
    extra round is a no-op, and the DuckDB oracle replays the SAME
    round count as chained CTEs — integer degrees only, no FP state.
    A pytest gate asserts the fixpoint is reached within num_rounds on
    the planted graph (rounds R-1 and R agree).

    Plan shape per round (holds at 10^11 edges): two left-semi joins
    keyed by node id restrict the symmetrized edge list to surviving
    endpoints, then one partial-aggregated groupBy(node) counts
    degrees — nothing wider than (id, id) on the wire, and the edge
    set only ever SHRINKS, so later rounds are strictly cheaper. The
    symmetrized edges are materialized once; the alive set
    re-checkpoints per round to truncate lineage (same discipline as
    pagerank/label_propagation above)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if num_rounds <= 0:
        raise ValueError(f"num_rounds must be positive, got {num_rounds}")
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")))
    sym = (e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionAll(e.select(F.col("v").alias("node"),
                              F.col("u").alias("nbr")))
           .distinct().localCheckpoint(eager=True))
    alive = sym.select("node").distinct().localCheckpoint(eager=True)
    deg = None
    for it in range(num_rounds):
        nbr_alive = alive.select(F.col("node").alias("nbr"))
        deg = (sym.join(alive, "node", "left_semi")
               .join(nbr_alive, "nbr", "left_semi")
               .groupBy("node")
               .agg(F.count("*").cast("bigint").alias("deg")))
        alive = deg.filter(F.col("deg") >= k).select("node")
        if it != num_rounds - 1:
            alive = alive.localCheckpoint(eager=True)
    return deg.filter(F.col("deg") >= k)


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """per-node triangle counts over the UNDIRECTED version of the
    graph — the standard local clustering signal (spam link farms are
    triangle-dense; organic link neighborhoods are sparse). Returns
    (node, n_triangles) for nodes in >=1 triangle.

    Scale shape (the published degree-ordered edge-iterator): every
    undirected edge is oriented from its lower (degree, id) endpoint
    to the higher, so a node's out-neighborhood in the oriented graph
    has at most O(sqrt(|E|)) members regardless of how skewed the real
    degree distribution is — the wedge join's per-key fan-out is
    bounded and the hub-node quadratic blowup of the naive
    neighbor-join never happens. Three narrow exchanges total: the
    degree count, the wedge equi-join on the pivot, and the closing
    edge equi-join on the (a, b) pair."""
    e, deg = _norm_edges_degrees(edges, src, dst)
    closed = _closed_triangles(e, deg)
    per_node = (closed.select(F.explode(F.array("pivot", "n1", "n2"))
                              .alias("node"))
                .groupBy("node")
                .agg(F.count("*").cast("bigint").alias("n_triangles")))
    return per_node


def _norm_edges_degrees(edges: DataFrame, src: str,
                        dst: str) -> tuple[DataFrame, DataFrame]:
    """(normalized distinct a<b edge list, (node, deg) table)."""
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("a"),
                 F.greatest("u", "v").alias("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("node"))
           .unionAll(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    return e, deg


def _closed_triangles(e: DataFrame, deg: DataFrame) -> DataFrame:
    """one row (pivot, n1, n2) per triangle via the degree-ordered
    edge-iterator (see triangle_counts docstring for the scale
    argument); vertex order is by (deg, id), not id."""
    da = deg.select(F.col("node").alias("a"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"),
                    F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    lo_first = (F.struct(F.col("deg_a"), F.col("a"))
                < F.struct(F.col("deg_b"), F.col("b")))
    oe = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lo_first, F.col("deg_b")).otherwise(F.col("deg_a"))
        .alias("deg_hi")).localCheckpoint(eager=True)
    x = oe.select(F.col("lo").alias("pivot"), F.col("hi").alias("n1"),
                  F.col("deg_hi").alias("dn1"))
    y = oe.select(F.col("lo").alias("pivot"), F.col("hi").alias("n2"),
                  F.col("deg_hi").alias("dn2"))
    wedges = (x.join(y, "pivot")
              .filter(F.struct(F.col("dn1"), F.col("n1"))
                      < F.struct(F.col("dn2"), F.col("n2"))))
    return wedges.join(
        oe.select(F.col("lo").alias("n1"), F.col("hi").alias("n2")),
        ["n1", "n2"], "left_semi")


def edge_jaccard(edges: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """per-EDGE neighborhood Jaccard over the undirected graph:
    J(a,b) = |N(a) & N(b)| / |N(a) | N(b)| with the link-prediction
    convention N(x) = all neighbors of x (so b in N(a) counts toward
    the union; Liben-Nowell & Kleinberg 2003 — public literature).
    Web pipelines read a high-J edge as "these two pages link to the
    same crowd" — mirror/farm families score near 1, organic citation
    edges near 0. Returns (id_a, id_b, common, jaccard round 6) for
    every normalized a<b edge (common = 0 edges included).

    |N(a) & N(b)| is exactly the triangle count through the edge, so
    the candidate generation reuses the degree-ordered edge-iterator
    (bounded wedge fan-out, no hub blowup): triangles explode to
    their 3 normalized edges, one groupBy counts per-edge support,
    and degrees broadcast back — union size needs no set math
    (deg_a + deg_b - common)."""
    e, deg = _norm_edges_degrees(edges, src, dst)
    closed = _closed_triangles(e, deg)
    tri_edges = closed.select(F.explode(F.array(
        F.struct(F.least("pivot", "n1").alias("a"),
                 F.greatest("pivot", "n1").alias("b")),
        F.struct(F.least("pivot", "n2").alias("a"),
                 F.greatest("pivot", "n2").alias("b")),
        F.struct(F.least("n1", "n2").alias("a"),
                 F.greatest("n1", "n2").alias("b")))).alias("p"))
    t = (tri_edges.select("p.a", "p.b")
         .groupBy("a", "b").agg(F.count("*").alias("common")))
    out = (e.join(t, ["a", "b"], "left")
           .join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("deg_a")), "a")
           .join(deg.select(F.col("node").alias("b"),
                            F.col("deg").alias("deg_b")), "b")
           .withColumn("common",
                       F.coalesce(F.col("common"), F.lit(0))
                       .cast("bigint")))
    j = (F.col("common")
         / (F.col("deg_a") + F.col("deg_b") - F.col("common")))
    return out.select(F.col("a").alias("id_a"),
                      F.col("b").alias("id_b"), "common",
                      F.round(j, 6).alias("jaccard"))


def link_reciprocity(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """-> (node, out_deg, recip, ratio round 6): per source node, how
    many of its distinct out-links are reciprocated (the reverse edge
    exists) — the mutual-linking signal that separates editorial link
    exchanges / mirror farms from organic citation in a web graph.

    One dedup pass over the edge list, one self LEFT SEMI join on the
    reversed key (no fan-out — semi join emits each edge at most
    once), two src-keyed groupBys sharing the exchange. Never keyed
    by anything wider than (src, dst)."""
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct())
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (e.join(rev, ["src", "dst"], "left_semi")
             .groupBy("src").agg(F.count("*").cast("long")
                                 .alias("recip")))
    deg = e.groupBy("src").agg(F.count("*").cast("long")
                               .alias("out_deg"))
    return (deg.join(recip, "src", "left")
            .select(F.col("src").alias("node"), "out_deg",
                    F.coalesce("recip", F.lit(0)).cast("long")
                    .alias("recip"),
                    F.round(F.coalesce("recip", F.lit(0))
                            / F.col("out_deg"), 6).alias("ratio")))
